"""FieldSpec -> Spark Column compiler (the data-generation operator core).

Parity: reference ``src/sqlHelpers.ts:28-98`` (columnExpr + helpers, operators
A1-A13 in SURVEY.md §2).  The reference emitted Trino SQL over engine
``random()``/``uuid()`` — *unseeded*, so generated rows were unreproducible.
We instead derive every random draw from ``xxhash64(id, column, salt, seed)``,
which is:

- deterministic per (seed, column, row id) — replayable for oracle checks,
  independent of partitioning, task retries, and executor count (``F.rand``
  is none of those: it depends on partition layout, which changes at scale);
- JVM-side and whole-stage-codegen friendly (no Python in the hot path), so a
  1000-executor load is pure codegen over ``spark.range``.

The reference's 10k-sequence CTE dance to synthesize row ids
(sqlHelpers.ts:160-212, operator A12) collapses to ``spark.range``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.schema.specs import (
    ArraySpec,
    BigintSpec,
    DateSpec,
    DoubleSpec,
    EnumSpec,
    FieldSpec,
    IntSpec,
    StringSpec,
    TableConfig,
    TimestampSpec,
)

# Uniform-draw denominator.  This is an ABSOLUTE lattice: floor(u * span)
# can only reach _U_DEN distinct values, so it must comfortably exceed any
# realistic spec span (a 2**30 grid would alias large BigintSpec ranges to
# ~1e9 lattice points).  2**40 is exact in a double and leaves modulo bias
# at a negligible 2**-24.
_U_DEN = 1 << 40


def _uniform(id_col: Column, name: str, salt: str, seed: int, *extra: Column) -> Column:
    """Deterministic U[0,1) from (row id, column name, salt, seed, extras).

    pmod (not abs) so xxhash64's Long.MIN_VALUE cannot overflow under ANSI.
    """
    h = F.xxhash64(id_col, F.lit(name), F.lit(salt), F.lit(seed), *extra)
    return F.pmod(h, F.lit(_U_DEN)).cast("double") / F.lit(float(_U_DEN))


def _int_expr(spec: IntSpec | BigintSpec, u: Column) -> Column:
    # A1/A2: uniform integer in [min, max] inclusive (sqlHelpers.ts:33-36,69-73)
    span = spec.max - spec.min
    expr = F.lit(spec.min) + F.floor(u * F.lit(span + 1)).cast("long")
    return expr.cast("int") if spec.kind == "int" else expr.cast("long")


def _double_expr(spec: DoubleSpec, u: Column) -> Column:
    # A3: uniform double in [min, max), rounded to 6 dp (sqlHelpers.ts:37-40,74-78)
    return F.round(F.lit(spec.min) + u * F.lit(spec.max - spec.min), 6)


def _string_expr(spec: StringSpec, id_col: Column, name: str, seed: int, *extra: Column) -> Column:
    # A4: random lowercase-hex string of exactly `length` chars.  The reference
    # used substr(uuid-hex, 1, len) and silently truncated at 32
    # (sqlHelpers.ts:41-43; temp.md:21 shows row_32 len 35 -> 32 chars).  We
    # chain as many md5 blocks as needed, so length > 32 is honored.
    blocks = []
    for b in range((spec.length + 31) // 32):
        blocks.append(
            F.md5(
                F.concat_ws(
                    "|",
                    id_col.cast("string"),
                    F.lit(name),
                    F.lit(f"str{b}"),
                    F.lit(str(seed)),
                    *[c.cast("string") for c in extra],
                )
            )
        )
    return F.substring(F.concat(*blocks), 1, spec.length)


def _enum_expr(spec: EnumSpec, u: Column) -> Column:
    # A5: uniform pick from the literal dictionary (sqlHelpers.ts:44-52).
    # u < 1 strictly, so the 1-based index is always within [1, n] — safe
    # under ANSI element_at.
    n = len(spec.values)
    arr = F.array(*[F.lit(v) for v in spec.values])
    return F.element_at(arr, (F.floor(u * F.lit(n)) + F.lit(1)).cast("int"))


def _parse_ts(s: str) -> _dt.datetime:
    d = _dt.datetime.fromisoformat(s)
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d


def _timestamp_expr(spec: TimestampSpec, u: Column) -> Column:
    # A6: uniform whole-second timestamp in [start, end) (sqlHelpers.ts:58-60)
    s = int(_parse_ts(spec.start).timestamp())
    e = int(_parse_ts(spec.end).timestamp())
    return F.timestamp_seconds(F.lit(s) + F.floor(u * F.lit(e - s)).cast("long"))


def _date_expr(spec: DateSpec, u: Column) -> Column:
    # A7: uniform date in [start, end] inclusive (sqlHelpers.ts:53-57,61-64);
    # day span computed host-side like the reference's daysBetween.
    start = _dt.date.fromisoformat(spec.start)
    end = _dt.date.fromisoformat(spec.end)
    dspan = (end - start).days
    return F.date_add(F.lit(spec.start).cast("date"), F.floor(u * F.lit(dspan + 1)).cast("int"))


def _scalar_expr(spec: FieldSpec, id_col: Column, name: str, seed: int, *extra: Column) -> Column:
    u = _uniform(id_col, name, "val", seed, *extra)
    if isinstance(spec, (IntSpec, BigintSpec)):
        return _int_expr(spec, u)
    if isinstance(spec, DoubleSpec):
        return _double_expr(spec, u)
    if isinstance(spec, StringSpec):
        return _string_expr(spec, id_col, name, seed, *extra)
    if isinstance(spec, EnumSpec):
        return _enum_expr(spec, u)
    if isinstance(spec, TimestampSpec):
        return _timestamp_expr(spec, u)
    if isinstance(spec, DateSpec):
        return _date_expr(spec, u)
    raise TypeError(f"unsupported scalar spec: {spec!r}")


def column_expr(spec: FieldSpec, id_col: Column, name: str, seed: int = 1) -> Column:
    """A10 dispatcher: compile one FieldSpec to a Column (sqlHelpers.ts:65-98)."""
    if isinstance(spec, ArraySpec):
        # A8: random-length array via sequence + transform (sqlHelpers.ts:87-94);
        # the element expression re-hashes with the lambda index so every slot
        # draws independently.
        u_len = _uniform(id_col, name, "len", seed)
        span = spec.max_len - spec.min_len
        n = (F.lit(spec.min_len) + F.floor(u_len * F.lit(span + 1))).cast("int")
        expr: Column = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: _scalar_expr(spec.element, id_col, name, seed, i),
        )
    else:
        expr = _scalar_expr(spec, id_col, name, seed)

    p = getattr(spec, "nullable", 0.0)
    if p and p > 0:
        # A9 wrapNullable (sqlHelpers.ts:28-32), with an independent draw
        u_null = _uniform(id_col, name, "null", seed)
        expr = F.when(u_null < F.lit(float(p)), F.lit(None)).otherwise(expr)
    return expr


def rows_df(
    spark: SparkSession, start_id: int, num_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """A11/A12 row source: ids [start_id, start_id + num_rows).

    Replaces the reference's UNNEST-sequence workaround for Trino's 10k
    sequence cap (sqlHelpers.ts:182-211).  numPartitions controls write
    parallelism — size it so each task writes ~a parquet row group.
    """
    return spark.range(start_id, start_id + num_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)


def generate_df(
    spark: SparkSession,
    config: TableConfig,
    start_id: int = 1,
    num_rows: int = 1000,
    seed: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full generated batch: SELECT <columnExpr per column> FROM range(...).

    Parity: the SELECT list of buildInsertSQL (sqlHelpers.ts:160-212, C1).
    """
    base = rows_df(spark, start_id, num_rows, num_partitions)
    id_col = F.col("id")
    cols = []
    for name, spec in config.columns.items():
        if name == config.id_column:
            cols.append(id_col.cast(spec.kind if spec.kind in ("int", "bigint") else "bigint").alias(name))
        else:
            cols.append(column_expr(spec, id_col, name, seed).alias(name))
    return base.select(*cols)
