"""Predicate -> prune-range derivation (``ranges_from_condition``) and
its type-safe use by ``delete_where`` (Iceberg DELETE derives its own
scan filter).  The safety bar: a derived range may only ever KEEP extra
files — any parse outside the strict conjunctive-comparison grammar, or
any literal whose type is not provably comparable with the column's
recorded type, must disable pruning (return None / drop the constraint),
never mis-prune.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
    ranges_from_condition,
)


def test_parses_conjunctive_comparisons():
    assert ranges_from_condition("k = 1") == {"k": (1, 1)}
    assert ranges_from_condition("k == 1") == {"k": (1, 1)}
    assert ranges_from_condition("k = 'x'") == {"k": ("x", "x")}
    assert ranges_from_condition("a >= 3 AND b < 7.5") == {
        "a": (3, None),
        "b": (None, 7.5),
    }
    # strict ops become INCLUSIVE endpoints — looser, never tighter
    assert ranges_from_condition("a > 3") == {"a": (3, None)}
    assert ranges_from_condition("v BETWEEN 10 AND 20") == {"v": (10, 20)}
    assert ranges_from_condition("day IN ('a', 'b')") == {"day": ["a", "b"]}
    assert ranges_from_condition(
        "day = '2024-01-02' AND v >= 100"
    ) == {"day": ("2024-01-02", "2024-01-02"), "v": (100, None)}
    # literal-first comparisons normalize with the operator flipped
    assert ranges_from_condition("3 <= a") == {"a": (3, None)}
    assert ranges_from_condition("7 > b AND b > 2") == {"b": (None, 7)}
    # duplicate constraint: first wins (conservative)
    assert ranges_from_condition("a > 1 AND a < 9") == {"a": (1, None)}
    assert ranges_from_condition("  k   =  1  ") == {"k": (1, 1)}
    # nullness predicates (null_value_counts pruning)
    assert ranges_from_condition("a IS NULL") == {"a": "is_null"}
    assert ranges_from_condition("a IS NOT NULL AND k = 1") == {
        "a": "not_null",
        "k": (1, 1),
    }


def test_rejects_everything_outside_the_grammar():
    for cond in [
        "a = 1 OR b = 2",  # disjunction: partial parse would over-prune
        "NOT a = 1",
        "a != 1",
        "a <> 1",
        "a IS",  # dangling IS
        "a IS NOT",  # dangling IS NOT
        "lower(a) = 'x'",
        "a = b",  # column-to-column
        "a + 1 = 2",
        "a LIKE 'x%'",
        "a IN (1, b)",
        "a IN ()",
        "a IN (1 2)",  # comma-less list is not SQL (review finding)
        "a IN ('x' 'y')",
        "a IN (1, 2,)",  # trailing comma
        "a BETWEEN 1 AND",
        "a = 1 AND",
        "a = TIMESTAMP '2024-01-01'",
        "t.a = 1",  # qualified name
        "a = \"x\"",  # double-quoted = identifier, not literal
        "",
        "   ",
        "AND",
    ]:
        assert ranges_from_condition(cond) is None, cond


def test_delete_auto_prunes_without_explicit_ranges(spark, tmp_path, monkeypatch):
    """delete_where with NO ranges derives them from the condition and
    still never opens cold files."""
    import pyarrow.parquet as pq_mod

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(
        "lab", "auto", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=["day"],
    )
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    wh.append(
        "lab", "auto",
        spark.createDataFrame(
            [(d, j) for d in days for j in range(4)], "day string, v int"
        ).coalesce(1),
        batch_id="b0",
    )
    head = wh.head_snapshot("lab", "auto")
    cold = [
        e["path"] for e in head["files"]
        if e["partitions"]["day"] != "2024-01-02"
    ]
    assert len(cold) == 2
    real = pq_mod.ParquetFile
    opened: list[str] = []

    def counting(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "ParquetFile", counting)
    out = wh.delete_where("lab", "auto", "day = '2024-01-02' AND v >= 2")
    assert out["files_rewritten"] == 1 and out["files_kept"] == 2
    assert out["rows_deleted"] == 2
    assert not [p for p in opened if any(c in p for c in cold)]
    assert wh.read("lab", "auto").count() == 10


def test_auto_ranges_drop_type_unsafe_constraints(spark, tmp_path):
    """A string literal against a TIMESTAMP column must NOT prune (the
    recorded ISO-T bounds sort after the space-separated literal at the
    boundary) — the delete still lands correctly via the full rewrite."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "ts", "zstd", 1, properties={"snapshots": "true"})
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")],
        "id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    wh.append("lab", "ts", df, batch_id="b0")
    head = wh._materialize("lab", "ts", wh._head_light("lab", "ts"))
    # the unsafe constraint is dropped entirely -> no pruning ranges
    assert wh._auto_ranges("ts = '2024-01-01 00:00:00'", head) is None
    # but the numeric constraint survives alongside it
    assert wh._auto_ranges(
        "ts = '2024-01-01 00:00:00' AND id = 1", head
    ) == {"id": (1, 1)}
    # end-to-end: the boundary row IS deleted (full candidacy, no loss)
    out = wh.delete_where("lab", "ts", "ts = '2024-01-01 00:00:00'")
    assert out["rows_deleted"] == 1
    assert [r.id for r in wh.read("lab", "ts").collect()] == [2]


def test_read_where_equals_read_filter(spark, tmp_path):
    """read_where == read().filter() for conditions inside AND outside
    the safe subset — pruning is invisible to results."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "rw", "zstd", 1, properties={"snapshots": "true"})
    for b in range(3):
        wh.append(
            "lab", "rw",
            spark.createDataFrame(
                [(b * 100 + j, f"s{j % 3}") for j in range(10)],
                "v int, s string",
            ).coalesce(1),
            batch_id=f"b{b}",
        )
    for cond in [
        "v BETWEEN 100 AND 105",          # prunes to one file
        "v >= 200",                        # prunes to one file
        "s = 's1' AND v < 50",             # mixed string + int
        "v % 2 = 0",                       # outside the grammar: no pruning
        "v > 90 OR v < 5",                 # disjunction: no pruning
    ]:
        want = sorted(
            (r.v, r.s) for r in wh.read("lab", "rw").filter(F.expr(cond)).collect()
        )
        got = sorted((r.v, r.s) for r in wh.read_where("lab", "rw", cond).collect())
        assert got == want, cond
    # and the pruning actually fires: a scoped condition schedules 1 file
    head = wh._head_light("lab", "rw")
    assert wh._auto_ranges("v >= 200", head) == {"v": (200, None)}
    kept, total = wh.prune_files("lab", "rw", {"v": (200, None)})
    assert total == 3 and len(kept) == 1


def test_auto_ranges_respect_recorded_types(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "tp", "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "tp",
        spark.createDataFrame(
            [(1, "a", "2024-01-05")], "id int, s string, d string"
        ).withColumn("d", F.to_date("d")),
        batch_id="b0",
    )
    head = wh._materialize("lab", "tp", wh._head_light("lab", "tp"))
    # ISO-date literal against a DATE column is order-safe -> kept
    assert wh._auto_ranges("d >= '2024-01-01'", head) == {
        "d": ("2024-01-01", None)
    }
    # arbitrary string against a date column -> dropped
    assert wh._auto_ranges("d = 'yesterday'", head) is None
    # number against a string column -> dropped (cast semantics unclear)
    assert wh._auto_ranges("s = 5", head) is None
    # unknown column -> dropped
    assert wh._auto_ranges("ghost = 1", head) is None
