"""Bucketed catalog tables: co-located joins with no shuffle.

The parquet warehouse (``sources/warehouse.py``) stores hive-layout
directories — right for the codec/compaction lab, but path-based reads give
Catalyst no bucketing metadata.  For the repeated-big-join shape (fact x
fact on a stable key, the 100 TB pattern the brief calls out), writing both
sides as catalog tables bucketed on the join key with the same bucket count
removes the shuffle from EVERY subsequent join on that key: the scan's
output partitioning already satisfies the join's distribution requirement.

This is Spark's own bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``); the metadata lives in the session catalog, so the demo is
self-contained — no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets (sort-merge join then
    skips the per-task sort too when joining on the sorted key)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
