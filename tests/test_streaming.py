"""Streaming twins must agree with their batch equivalents on finite input."""

from __future__ import annotations

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators.workload import q_per_minute
from hands_on_iceberg_compression_spark.streaming.events_stream import (
    read_events_stream,
    run_available_now,
    streaming_dedup,
    windowed_counts,
)

from tests.conftest import SF_SMALL


def test_windowed_counts_match_batch(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMALL)
    result = run_available_now(
        windowed_counts(stream), "win_counts", str(tmp_path / "ckpt")
    ).toPandas()
    batch = q_per_minute(spark, SF_SMALL).toPandas()
    s = result.sort_values("minute", ignore_index=True)
    b = batch.rename(columns={"minute": "minute"}).sort_values("minute", ignore_index=True)
    assert len(s) == len(b)
    assert (s["cnt"].values == b["cnt"].values).all()
    assert (abs(s["sum_value"].values - b["sum_value"].values) < 1e-6).all()


def test_streaming_dedup(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMALL)
    deduped = run_available_now(
        streaming_dedup(stream), "dedup_stream", str(tmp_path / "ckpt2")
    )
    n_stream = deduped.count()
    n_batch = (
        spark.read.schema("event_id long")
        .parquet(f"{SF_SMALL}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert n_stream == n_batch
    assert deduped.select("event_id").distinct().count() == n_stream
