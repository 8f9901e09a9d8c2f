"""Format connectors round-trip + streaming->warehouse ingest + Iceberg DDL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.schema.reference_schemas import (
    narrow_example_config,
)
from hands_on_iceberg_compression_spark.sources.fixtures import load_table
from hands_on_iceberg_compression_spark.sources.formats import read_table, write_table
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
    iceberg_ddl,
)

from tests.conftest import SF_SMALL


def test_format_roundtrips(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "lineitem").limit(500)
    schema = src.schema
    for fmt in ("parquet", "csv", "json", "orc"):
        path = str(tmp_path / fmt)
        write_table(src, path, fmt)
        back = read_table(spark, path, fmt, schema=schema)
        assert back.count() == 500, fmt
        # value fidelity on a numeric aggregate
        a = src.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0]["s"]
        b = back.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0]["s"]
        assert a == b, fmt


def test_format_roundtrip_avro(spark, tmp_path):
    """AVRO completes the reference format enum (types.ts:35); the external
    spark-avro module is not on this container's classpath (no network), so
    this documents the absence as a skip-with-reason and becomes a real
    round-trip the moment the jar appears."""
    import pytest

    from hands_on_iceberg_compression_spark.sources.formats import avro_available

    if not avro_available(spark):
        pytest.skip(
            "spark-avro jar not on classpath (external module; container has "
            "no network) — avro surface is wired but environment-blocked"
        )
    src = load_table(spark, SF_SMALL, "lineitem").limit(500)
    path = str(tmp_path / "avro")
    write_table(src, path, "avro")
    assert read_table(spark, path, "avro", schema=src.schema).count() == 500


def test_stream_into_warehouse(spark, tmp_path):
    from hands_on_iceberg_compression_spark.streaming.events_stream import (
        read_events_stream,
        stream_into_warehouse,
    )

    cfg = narrow_example_config()
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(cfg.schema, "events_ingest", "zstd", 3)
    stream = read_events_stream(spark, SF_SMALL)
    stream_into_warehouse(stream, wh, cfg.schema, "events_ingest", str(tmp_path / "ckpt"))

    got = wh.read(cfg.schema, "events_ingest")
    want = load_table(spark, SF_SMALL, "events")
    assert got.count() == want.count()
    # re-running with the same checkpoint is a no-op (exactly-once ingest)
    stream2 = read_events_stream(spark, SF_SMALL)
    stream_into_warehouse(stream2, wh, cfg.schema, "events_ingest", str(tmp_path / "ckpt"))
    assert wh.read(cfg.schema, "events_ingest").count() == want.count()


def test_streaming_ingest_with_maintenance_policy(spark, tmp_path):
    """Ingest-co-located table maintenance: every N epochs the sink
    compacts the partitions touched since the last tick (scoped rewrite)
    and expires old snapshots — file counts stay bounded at streaming
    cadence, rows and partition values stay intact."""
    from hands_on_iceberg_compression_spark.functions.generators import generate_df
    from hands_on_iceberg_compression_spark.streaming.events_stream import (
        stream_into_warehouse,
    )

    cfg = narrow_example_config()  # days(created_at)
    src = generate_df(spark, cfg, 1, 200, seed=61, num_partitions=1)
    src_dir = str(tmp_path / "src")
    src.repartition(4).write.parquet(src_dir)  # 4 files -> 4 epochs

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(
        cfg.schema, "maint", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=cfg.partitioning,
    )
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_into_warehouse(
        stream, wh, cfg.schema, "maint", str(tmp_path / "ckpt"),
        maintenance_every=2, expire_keep_last=3,
    )
    got = wh.read(cfg.schema, "maint")
    assert got.count() == 200
    assert {r.id for r in got.select("id").collect()} == set(range(1, 201))
    ops = [h["operation"] for h in wh.history(cfg.schema, "maint")]
    assert "optimize" in ops  # maintenance ticked
    assert len(ops) <= 3  # expiry kept the log bounded
    # fragmentation bounded: every day landed in >=2 epochs but was
    # compacted — fewer files than epoch-appends would have left behind
    head = wh.head_snapshot(cfg.schema, "maint")
    per_day: dict[str, int] = {}
    for e in head["files"]:
        d = e["partitions"]["created_at_day"]
        per_day[d] = per_day.get(d, 0) + 1
    assert max(per_day.values()) <= 2
    # maintenance on a dir-mode table is refused
    wh.create_table(cfg.schema, "maintdir", "zstd", 1)
    stream2 = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    with pytest.raises(ValueError, match="log-mode"):
        stream_into_warehouse(
            stream2, wh, cfg.schema, "maintdir", str(tmp_path / "ckpt2"),
            maintenance_every=2,
        )


def test_alter_properties_and_show_create(spark, tmp_path):
    from hands_on_iceberg_compression_spark.functions.generators import generate_df
    from hands_on_iceberg_compression_spark.pipeline.metrology import measure_sizes

    cfg = narrow_example_config()
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(cfg.schema, "alterable", "snappy")
    df = generate_df(spark, cfg, 1, 20000, seed=9, num_partitions=1)
    wh.append(cfg.schema, "alterable", df, batch_id="b0")
    snappy_bytes = measure_sizes(wh, cfg.schema, "alterable", "snappy", None).data_bytes

    # ALTER to zstd-9; subsequent writes (incl. compaction rewrite) honor it
    wh.alter_table_properties(cfg.schema, "alterable", codec="zstd", level=9)
    wh.optimize(cfg.schema, "alterable", target_file_size_bytes=256 * 1024 * 1024)
    zstd_bytes = measure_sizes(wh, cfg.schema, "alterable", "zstd", 9).data_bytes
    assert zstd_bytes < snappy_bytes
    assert wh.read(cfg.schema, "alterable").count() == 20000

    ddl = wh.show_create_table(cfg.schema, "alterable")
    assert "'write.parquet.compression-codec'='zstd'" in ddl
    assert "'write.parquet.compression-level'='9'" in ddl
    assert "amount double" in ddl


def test_iceberg_ddl_emission():
    cfg = narrow_example_config()
    ddl = iceberg_ddl(cfg, "orders_narrow_zstd_l06", "zstd", 6)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (days(created_at))" in ddl
    assert "'write.parquet.compression-codec'='zstd'" in ddl
    assert "'write.parquet.compression-level'='6'" in ddl
    assert "tags array<string>" in ddl
    assert "created_at timestamp" in ddl


def test_stream_into_partitioned_log_table_exactly_once(spark, tmp_path):
    """Round-4 composition: a partitioned snapshots=true destination is now a
    legal streaming sink — each epoch commits a unique generation, and an
    epoch REPLAY (fresh checkpoint, same epoch ids over the same source)
    supersedes its prior generation instead of duplicating rows: the
    Iceberg snapshot-commit shape without the jar."""
    from hands_on_iceberg_compression_spark.streaming.events_stream import (
        read_events_stream,
        stream_into_warehouse,
    )

    cfg = narrow_example_config()
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(
        cfg.schema, "events_log", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=["days(ts)"],
    )
    want = load_table(spark, SF_SMALL, "events").count()
    stream_into_warehouse(
        read_events_stream(spark, SF_SMALL), wh, cfg.schema, "events_log",
        str(tmp_path / "ckpt1"),
    )
    assert wh.read(cfg.schema, "events_log").count() == want
    v_first = wh.snapshots(cfg.schema, "events_log")[-1]["version"]

    # FULL replay: a fresh checkpoint re-delivers every epoch with the SAME
    # epoch ids — the crash-recovery worst case for an idempotent sink
    stream_into_warehouse(
        read_events_stream(spark, SF_SMALL), wh, cfg.schema, "events_log",
        str(tmp_path / "ckpt2"),
    )
    got = wh.read(cfg.schema, "events_log")
    assert got.count() == want, "replayed epochs duplicated rows"
    assert "ts_day" in got.columns
    head = wh.snapshots(cfg.schema, "events_log")[-1]
    assert head["version"] > v_first
    assert head["total_rows"] == want
    assert all("partitions" in f for f in head["files"])

    # partitioned DIR-mode destination is still (correctly) refused
    import pytest as _pytest

    wh.create_table(cfg.schema, "events_dir", "zstd", 1, partitioning=["days(ts)"])
    with _pytest.raises(NotImplementedError, match="log mode"):
        stream_into_warehouse(
            read_events_stream(spark, SF_SMALL), wh, cfg.schema, "events_dir",
            str(tmp_path / "ckpt3"),
        )
