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
from pyspark.sql.types import StructType

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


def prepare_events_session(spark: SparkSession, path: str) -> bool:
    """Pin the confs the events TIMESTAMP(NANOS) column needs and return
    whether this runtime surfaces it as a raw ns BIGINT.

    How Spark reads parquet NANOS changed across 4.x:
      - up to 4.0: the scan rejects NANOS (PARQUET_TYPE_ILLEGAL) unless
        spark.sql.legacy.parquet.nanosAsLong=true, which yields raw
        ns-since-epoch BIGINT;
      - 4.1+: NANOS reads natively as TIMESTAMP_NTZ, already
        micro-truncated; the legacy conf is silently ignored (this exact
        shift broke 53 tests between rounds — keep ONE source of truth).
    The UTC pin matters either way: ``normalize_events_ts`` produces an
    *instant* (TIMESTAMP_LTZ) whose wall-clock rendering and
    string-literal comparisons depend on the session timezone, while the
    stored values and every oracle are tz-naive."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return dict(spark.read.parquet(path).dtypes)["ts"] == "bigint"


def normalize_events_ts(df: DataFrame, ns_as_long: bool) -> DataFrame:
    """Normalize the events ts column to TIMESTAMP (an instant, UTC pin
    assumed — see prepare_events_session) from either runtime's raw form.

    BIGINT path: truncate with *integer* division (ns epochs exceed 2**53,
    float division loses precision) then timestamp_micros().  NTZ path: a
    bare cast — the session tz is UTC, so the naive wall-clock reinterprets
    as the same instant the bigint path produces.  DuckDB applies the same
    ns->us truncation, so oracles agree either way."""
    if ns_as_long:
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


# Per-(session, file) metadata cache: parquet READ schema + the events
# ns-as-long probe result (r19 optimization, guide §6 "file listing"/metadata
# overheads).  Schema inference is a driver-side footer read costing
# 70-170 ms per spark.read.parquet call — pure planning overhead a cataloged
# table never pays (its schema is declared once).  Caching the inferred
# schema and re-reading with spark.read.schema(...) keeps plans byte-
# identical (pushdown/pruning/column order unchanged; the cached schema IS
# the inferred one) while every build after the first skips the footer job.
# Keyed by (applicationId, abspath): a new session/JVM re-probes (the
# ns-as-long answer is runtime-dependent), a different fixture dir is a
# different key, and the cache holds pure-Python StructTypes only (no JVM
# references — safe across session restarts).  NEVER cache data or results
# here: this is plan metadata, recomputed from the file on first touch.
_SCHEMA_CACHE: dict[tuple[str, str, int, int], StructType] = {}
_NS_PROBE_CACHE: dict[tuple[str, str, int, int], bool] = {}


def _cache_key(spark: SparkSession, path: str) -> tuple[str, str, int, int]:
    # (st_mtime_ns, st_size) folded in (ADVICE r19): a file rewritten
    # in-place with a different schema during the same application must
    # invalidate the entry, or explicit-schema reads would misdecode.
    st = os.stat(path)
    return (
        spark.sparkContext.applicationId,
        os.path.abspath(path),
        st.st_mtime_ns,
        st.st_size,
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = _cache_key(spark, path)
    if name == "events":
        # the session confs are (re)pinned on EVERY call — they are cheap
        # (no job) and other code may legitimately reset them mid-session;
        # only the footer-read probe + schema are cached
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if key not in _NS_PROBE_CACHE:
            raw = spark.read.parquet(path)
            _NS_PROBE_CACHE[key] = dict(raw.dtypes)["ts"] == "bigint"
            _SCHEMA_CACHE[key] = raw.schema
        raw = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
        return normalize_events_ts(raw, _NS_PROBE_CACHE[key])
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
