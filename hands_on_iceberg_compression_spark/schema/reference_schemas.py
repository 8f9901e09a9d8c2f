"""Reference-derived table configs.

WIDE_EVENTS: the active 90-column ``events`` schema the reference's baseline
numbers were measured on (reference src/config/tableConfig.ts:15-192,
SURVEY.md §1.3).  Column layout: id bigint + row_1..row_89 with 9 timestamps
over 2024 (rows 1,2,37,42-46,60), 19 ranged nullable ints, 53 fixed-length
hex strings, and 8 enum columns whose dictionaries come from the seeded
Mulberry32 PRNG (utils.ts:40-69) — reproduced bit-exactly in
functions/prng.py and verified column-by-column against the reference.

NARROW_EXAMPLE: the commented-out example schema (tableConfig.ts:193-203),
which exercises every DSL kind; canonical generator-unit-test schema
(FIXTURES.md §2b).
"""

from __future__ import annotations

from hands_on_iceberg_compression_spark.functions.prng import generate_random_strings
from hands_on_iceberg_compression_spark.schema.specs import (
    ArraySpec,
    BigintSpec,
    DoubleSpec,
    EnumSpec,
    FieldSpec,
    IntSpec,
    StringSpec,
    TableConfig,
    TimestampSpec,
)

_TS_2024 = dict(start="2024-01-01", end="2025-01-01")

# (column index -> spec shape) transcription of tableConfig.ts:17-191.
_WIDE_TS = {1, 2, 37, 42, 43, 44, 45, 46, 60}
_WIDE_INT = {  # row_n -> (min, max, nullable)
    9: (1000, 10000, 0.05),
    10: (1000, 2500, 0.03),
    11: (100, 250, 0.03),
    12: (1000, 3000, 0.03),
    13: (100, 300, 0.03),
    14: (100, 5000, 0.03),
    15: (10, 500, 0.03),
    16: (30, 100, 0.03),
    17: (3, 10, 0.03),
    18: (1, 5, 0.03),
    19: (1000, 2500, 0.03),
    20: (100, 250, 0.03),
    21: (1000, 3000, 0.03),
    22: (100, 300, 0.03),
    23: (100, 5000, 0.03),
    24: (10, 500, 0.03),
    25: (30, 100, 0.03),
    26: (3, 10, 0.03),
    27: (1, 5, 0.03),
}
_WIDE_ENUM = {  # row_n -> (count, length) for generateRandomStrings(count, length)
    28: (5, 1),
    48: (8, 1),
    54: (8, 1),
    61: (500, 8),
    62: (500, 8),
    63: (500, 8),
    67: (3, 1),
    72: (3, 1),
}
_WIDE_STR = {  # row_n -> length
    3: 7, 4: 7, 5: 1, 6: 3, 7: 1, 8: 4, 29: 8, 30: 8, 31: 13, 32: 35,
    33: 1, 34: 2, 35: 1, 36: 5, 38: 14, 39: 10, 40: 14, 41: 7, 47: 8,
    49: 2, 50: 1, 51: 2, 52: 1, 53: 1, 55: 2, 56: 3, 57: 5, 58: 5, 59: 2,
    64: 3, 65: 2, 66: 7, 68: 12, 69: 12, 70: 12, 71: 12, 73: 32, 74: 32,
    75: 8, 76: 8, 77: 4, 78: 1, 79: 1, 80: 1, 81: 1, 82: 1, 83: 10,
    84: 16, 85: 14, 86: 10, 87: 1, 88: 5, 89: 4,
}


def _wide_columns() -> dict[str, FieldSpec]:
    cols: dict[str, FieldSpec] = {"id": BigintSpec(min=1, max=1)}
    for n in range(1, 90):
        name = f"row_{n}"
        if n in _WIDE_TS:
            cols[name] = TimestampSpec(**_TS_2024)
        elif n in _WIDE_INT:
            lo, hi, p = _WIDE_INT[n]
            cols[name] = IntSpec(min=lo, max=hi, nullable=p)
        elif n in _WIDE_ENUM:
            count, length = _WIDE_ENUM[n]
            cols[name] = EnumSpec(values=tuple(generate_random_strings(count, length)))
        else:
            cols[name] = StringSpec(length=_WIDE_STR[n])
    assert len(cols) == 90
    return cols


def wide_events_config(
    schema: str = "lab", table_base: str = "events", catalog: str = "spark_catalog"
) -> TableConfig:
    return TableConfig(
        catalog=catalog,
        schema=schema,
        table_base=table_base,
        columns=_wide_columns(),
        id_column="id",
        format="PARQUET",
        # The reference declared ["date(created_at)"] but it was dead config
        # (FIXME at sqlHelpers.ts:127; created_at absent from columns).  We fix
        # it properly: partition by day of the first timestamp column.
        partitioning=["days(row_1)"],
    )


def narrow_example_config(
    schema: str = "lab", table_base: str = "orders_narrow", catalog: str = "spark_catalog"
) -> TableConfig:
    return TableConfig(
        catalog=catalog,
        schema=schema,
        table_base=table_base,
        columns={
            "id": BigintSpec(min=1, max=1),
            "user_name": StringSpec(length=16),
            "amount": DoubleSpec(min=0, max=10000, nullable=0.05),
            "created_at": TimestampSpec(**_TS_2024),
            "status": EnumSpec(values=("new", "paid", "delivered", "canceled")),
            "country": EnumSpec(values=("KZ", "US", "DE", "TR", "PL"), nullable=0.02),
            "age": IntSpec(min=18, max=78, nullable=0.03),
            "note": StringSpec(length=8, nullable=0.1),
            "tags": ArraySpec(
                element=EnumSpec(values=("alpha", "beta", "gamma", "delta")),
                min_len=1,
                max_len=3,
                nullable=0.1,
            ),
        },
        id_column="id",
        format="PARQUET",
        partitioning=["days(created_at)"],
    )
