"""Driver-fixture parquet sources (TESTDATA.md / FIXTURES.md §1).

Plain ``spark.read.parquet`` — declarative scans so Catalyst keeps predicate
pushdown, column pruning, and (on partitioned layouts) partition pruning.  At
100 TB these would be Iceberg/partitioned-parquet tables; the query operators
only see DataFrames, so the source swap is a one-liner here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet.  How Spark surfaces that
        # changed across 4.x:
        #   - up to 4.0: the scan rejects NANOS (PARQUET_TYPE_ILLEGAL) unless
        #     spark.sql.legacy.parquet.nanosAsLong=true, which yields raw
        #     ns-since-epoch BIGINT -> truncate with *integer* division (ns
        #     epochs exceed 2**53, float division loses precision) and
        #     timestamp_micros().
        #   - 4.1+: NANOS reads natively as TIMESTAMP_NTZ, already
        #     micro-truncated; the legacy conf is silently ignored.
        # DuckDB applies the same ns->us truncation, so oracles agree either
        # way.  Both paths normalize to an *instant* (TIMESTAMP_LTZ) under a
        # UTC session pin: wall-clock rendering and string-literal
        # comparisons depend on the session timezone, and the stored values
        # and every oracle are tz-naive — a non-UTC caller session must not
        # shift every events-timestamp predicate.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        # timestamp_ntz -> timestamp: session tz is pinned UTC above, so the
        # cast reinterprets the naive wall-clock as the same UTC instant the
        # bigint path produced.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
