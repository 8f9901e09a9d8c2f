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
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects
        # (PARQUET_TYPE_ILLEGAL).  Read it as raw ns-since-epoch long and
        # truncate to Spark's native microseconds with *integer* division —
        # float division would lose precision (ns epochs exceed 2**53).
        # DuckDB applies the same ns->us truncation, so oracles agree.
        #
        # timestamp_micros() produces an *instant* (TIMESTAMP_LTZ) whose
        # wall-clock rendering and string-literal comparisons depend on the
        # session timezone; the stored values and every oracle are tz-naive.
        # Pin the session to UTC so a non-UTC caller session cannot shift
        # every events-timestamp predicate and rendering.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
