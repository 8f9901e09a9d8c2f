"""Null-count manifest stats (Iceberg null_value_counts) and
IS [NOT] NULL pruning: entries record per-column null counts from the
parquet footer; ``prune_files`` accepts ``{col: "is_null"|"not_null"}``
specs; the predicate parser derives them; partition NULL sentinels prove
metadata-only deletes both ways.  The inviolable contract stays
``read_pruned(...).filter(p) == read(...).filter(p)``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
    conjuncts_from_condition,
)


@pytest.fixture()
def null_table(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "nt", "zstd", 1, properties={"snapshots": "true"})
    # b0: no nulls; b1: some nulls; b2: all nulls in v
    wh.append(
        "lab", "nt",
        spark.createDataFrame([(1, 10), (2, 20)], "id int, v int").coalesce(1),
        batch_id="b0",
    )
    wh.append(
        "lab", "nt",
        spark.createDataFrame([(3, 30), (4, None)], "id int, v int").coalesce(1),
        batch_id="b1",
    )
    wh.append(
        "lab", "nt",
        spark.createDataFrame(
            [(5, None), (6, None)], "id int, v int"
        ).coalesce(1),
        batch_id="b2",
    )
    return wh


def test_entries_record_null_counts(null_table):
    wh = null_table
    head = wh.head_snapshot("lab", "nt")
    by_batch = {e["path"].split("/")[1]: e for e in head["files"]}
    assert by_batch["b0"]["nulls"]["v"] == 0
    assert by_batch["b1"]["nulls"]["v"] == 1
    assert by_batch["b2"]["nulls"]["v"] == 2
    assert by_batch["b0"]["nulls"]["id"] == 0


def test_prune_on_nullness(null_table):
    wh = null_table
    kept, total = wh.prune_files("lab", "nt", {"v": "is_null"})
    assert total == 3 and len(kept) == 2  # b0 (zero nulls) pruned
    assert not any("/b0/" in k for k in kept)
    kept2, _ = wh.prune_files("lab", "nt", {"v": "not_null"})
    assert len(kept2) == 2  # b2 (all nulls) pruned
    assert not any("/b2/" in k for k in kept2)
    # invariant: pruned + filter == full + filter
    for spec, pred in [
        ("is_null", F.col("v").isNull()),
        ("not_null", F.col("v").isNotNull()),
    ]:
        full = {r.id for r in wh.read("lab", "nt").filter(pred).collect()}
        pruned = {
            r.id
            for r in wh.read_pruned("lab", "nt", {"v": spec})
            .filter(pred)
            .collect()
        }
        assert pruned == full, spec


def test_read_where_and_delete_derive_nullness(null_table, monkeypatch):
    import pyarrow.parquet as pq_mod

    wh = null_table
    got = sorted(
        r.id for r in wh.read_where("lab", "nt", "v IS NULL").collect()
    )
    assert got == [4, 5, 6]
    got2 = sorted(
        r.id
        for r in wh.read_where("lab", "nt", "v IS NOT NULL AND id >= 2").collect()
    )
    assert got2 == [2, 3]
    # delete WHERE v IS NULL: b0 (zero nulls) must not even be opened
    head = wh.head_snapshot("lab", "nt")
    b0 = next(e["path"] for e in head["files"] if "/b0/" in e["path"])
    real = pq_mod.ParquetFile
    opened: list[str] = []

    def counting(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "ParquetFile", counting)
    out = wh.delete_where("lab", "nt", "v IS NULL")
    assert out["rows_deleted"] == 3 and out["files_kept"] == 1
    assert not any(b0 in p for p in opened)
    assert sorted(r.id for r in wh.read("lab", "nt").collect()) == [1, 2, 3]


def test_null_partition_sentinel_metadata_delete(spark, tmp_path):
    """A NULL identity-partition value proves 'day IS NULL' for every row
    of its files — the delete is metadata-only; 'day IS NOT NULL' proves
    the complement."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(
        "lab", "np", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=["day"],
    )
    wh.append(
        "lab", "np",
        spark.createDataFrame(
            [("2024-01-01", 1), (None, 2), (None, 3)], "day string, v int"
        ).coalesce(1),
        batch_id="b0",
    )
    head = wh.head_snapshot("lab", "np")
    assert {e["partitions"]["day"] for e in head["files"]} == {
        "2024-01-01", "__HIVE_DEFAULT_PARTITION__",
    }
    out = wh.delete_where("lab", "np", "day IS NULL")
    assert out["files_dropped_outright"] == 1 and out["files_rewritten"] == 0
    assert out["rows_deleted"] == 2
    got = [(r.day, r.v) for r in wh.read("lab", "np").collect()]
    assert got == [("2024-01-01", 1)]
    out2 = wh.delete_where("lab", "np", "day IS NOT NULL")
    assert out2["files_dropped_outright"] == 1 and out2["rows_deleted"] == 1
    assert wh.read("lab", "np").count() == 0


def test_conjuncts_parse_nullness():
    assert conjuncts_from_condition("v IS NULL") == [("v", "is_null")]
    assert conjuncts_from_condition("v IS NOT NULL") == [("v", "not_null")]
    assert conjuncts_from_condition("v IS NULL AND v IS NOT NULL") == [
        ("v", "is_null"), ("v", "not_null"),
    ]
    assert conjuncts_from_condition("IS NULL") is None
    assert conjuncts_from_condition("v IS 1") is None
