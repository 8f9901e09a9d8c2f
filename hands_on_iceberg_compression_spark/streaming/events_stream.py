"""Structured Streaming analogues of the event pipeline.

The reference is batch-only (SURVEY.md §2 closing note: no streams); these
are the streaming twins its ``events`` table invites, built on the standard
Spark patterns: file source -> watermark -> windowed aggregation -> sink, and
watermarked streaming dedup.

Scale posture: the file source is swapped for Kafka by changing ``format``;
watermark bounds state so a 1000-executor streaming job does not grow
unboundedly; ``availableNow`` triggers make the same code testable as a
finite batch-backfill, which is also the production backfill story.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns in the fixture parquet
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events fixture (file source; Kafka-swappable)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def windowed_counts(events: DataFrame, window: str = "1 minute", watermark: str = "10 minutes") -> DataFrame:
    """Per-window event counts + value sums with late-data watermarking."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("minute"), "cnt", "sum_value")
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    state is bounded by the watermark, so memory is O(events per horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_available_now(df: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """Run a streaming DataFrame to completion on the available data
    (availableNow trigger -> memory sink) and return the final result as a
    batch DataFrame.  This is both the test harness and the backfill mode."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_aggregation(df) else "append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(query_name)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
