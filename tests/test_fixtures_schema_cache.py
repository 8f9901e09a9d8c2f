"""r19: load_table's per-(session, file) schema/probe cache must be
metadata-only — identical schemas, identical rows, per-path keys — so a
cache hit can never change what a query computes."""

from __future__ import annotations

import pytest

from hands_on_iceberg_compression_spark.sources import fixtures as FX

from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.fixture(autouse=True)
def _restore_caches():
    """ADVICE r19: tests clear the module-global caches — snapshot and
    restore them so cache state never leaks between tests."""
    schema_snap = dict(FX._SCHEMA_CACHE)
    probe_snap = dict(FX._NS_PROBE_CACHE)
    yield
    FX._SCHEMA_CACHE.clear()
    FX._SCHEMA_CACHE.update(schema_snap)
    FX._NS_PROBE_CACHE.clear()
    FX._NS_PROBE_CACHE.update(probe_snap)


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


def test_inplace_rewrite_invalidates_cache(spark, tmp_path):
    """ADVICE r19: a parquet file rewritten in-place with a different schema
    during the same application must MISS the cache (key folds mtime+size),
    so the explicit-schema read can never misdecode the new file."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    FX._SCHEMA_CACHE.clear()
    FX._NS_PROBE_CACHE.clear()
    d = tmp_path / "sfX"
    d.mkdir()
    dst = d / "documents.parquet"
    shutil.copyfile(f"{SF_ORACLE}/documents.parquet", dst)
    first = FX.load_table(spark, str(d), "documents")
    first_schema = first.schema
    # rewrite in place with one column dropped (different schema, same path)
    tbl = pq.read_table(dst)
    pq.write_table(tbl.drop_columns([tbl.schema.names[-1]]), dst)
    second = FX.load_table(spark, str(d), "documents")
    assert len(second.schema) == len(first_schema) - 1
    second.limit(1).collect()  # decodes under the re-inferred schema
