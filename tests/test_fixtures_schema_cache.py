"""r19: load_table's per-(session, file) schema/probe cache must be
metadata-only — identical schemas, identical rows, per-path keys — so a
cache hit can never change what a query computes."""

from __future__ import annotations

import pytest

from hands_on_iceberg_compression_spark.sources import fixtures as FX

from tests.conftest import SF_ORACLE, SF_SMALL


def test_cached_build_schema_and_rows_identical(spark):
    FX._SCHEMA_CACHE.clear()
    FX._NS_PROBE_CACHE.clear()
    for name in ("events", "lineitem", "documents", "embeddings"):
        first = FX.load_table(spark, SF_ORACLE, name)   # cache miss: infers
        second = FX.load_table(spark, SF_ORACLE, name)  # cache hit: explicit
        assert first.schema == second.schema, name
        fresh = spark.read.parquet(f"{SF_ORACLE}/{name}.parquet")
        if name != "events":
            assert second.schema == fresh.schema, name
        a = sorted(map(str, first.collect()))
        b = sorted(map(str, second.collect()))
        assert a == b, name


def test_cache_keys_are_per_path(spark):
    FX._SCHEMA_CACHE.clear()
    FX._NS_PROBE_CACHE.clear()
    FX.load_table(spark, SF_ORACLE, "events")
    FX.load_table(spark, SF_SMALL, "events")
    paths = {k[1] for k in FX._NS_PROBE_CACHE}
    assert len(paths) == 2  # one probe per file, never shared across dirs


def test_events_ts_is_timestamp_on_hit(spark):
    FX._SCHEMA_CACHE.clear()
    FX._NS_PROBE_CACHE.clear()
    FX.load_table(spark, SF_ORACLE, "events")
    ev = FX.load_table(spark, SF_ORACLE, "events")  # hit path
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # the UTC pin is re-applied on every call, hit or miss
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_unknown_table_still_refuses(spark):
    with pytest.raises(KeyError):
        FX.load_table(spark, SF_ORACLE, "nope")
