"""Streaming document curation: the training-data funnel as a stream.

The batch curation funnel (``operators/textops.py:q_curation_funnel``) run
incrementally: documents arrive as files (Kafka-swappable file source), the
quality filter is stateless, exact dedup keys the stream on the content
digest, and survivors land in the warehouse via the exactly-once
foreachBatch path.  ``availableNow`` triggers make the same code testable
as a finite job — `tests/test_streaming_curation.py` asserts the streaming
counts equal the batch funnel's.

Scale notes: the quality filter is a stateless projection (scales with
input splits); `dropDuplicates` on the digest keeps one 16-byte key per
unique document in the state store — unbounded by design (a dup must be
caught whenever it re-arrives), which is exactly the semantics the batch
groupBy(digest) has; on a real cluster back the state with RocksDB
(`spark.sql.streaming.stateStore.providerClass`) the way any large
streaming dedup does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_QUALITY_LANGS = ("en", "es", "de", "fr")


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the documents fixture (file source)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def quality_filter(docs: DataFrame) -> DataFrame:
    """Stateless quality gate — the streaming twin of the batch funnel's
    first stage (same thresholds, same expressions)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return docs.filter(
        (n >= 5) & (uniq_ratio > 0.3) & F.col("lang").isin(*_QUALITY_LANGS)
    )


def with_digest(docs: DataFrame) -> DataFrame:
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), "\\s+", " ")))
    return docs.withColumn("digest", F.md5(norm.cast("binary")))


def curated_stream(docs: DataFrame) -> DataFrame:
    """quality filter -> digest -> streaming exact dedup (first arrival of
    each digest survives, matching the batch funnel's min-doc_id survivor
    up to arrival order)."""
    return with_digest(quality_filter(docs)).dropDuplicates(["digest"])


def stream_curated_into_warehouse(
    docs: DataFrame,
    warehouse,
    schema: str,
    table: str,
    checkpoint_dir: str,
) -> None:
    """Run the curation funnel into a warehouse table, exactly-once per
    epoch (committer-isolated batch dirs keyed by epoch id)."""
    curated = curated_stream(docs)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        warehouse.append(
            schema, table, batch_df.drop("digest"), batch_id=f"epoch_{epoch_id:08d}"
        )

    q = (
        curated.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
