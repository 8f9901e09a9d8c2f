"""Streaming curation funnel == batch curation funnel (availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators.textops import q_curation_funnel
from hands_on_iceberg_compression_spark.sources.warehouse import ParquetWarehouse
from hands_on_iceberg_compression_spark.streaming.documents_stream import (
    curated_stream,
    read_documents_stream,
    stream_curated_into_warehouse,
)

from tests.conftest import SF_SMALL


def test_streaming_counts_match_batch_funnel(spark, tmp_path):
    batch = q_curation_funnel(spark, SF_SMALL).collect()[0]

    docs = read_documents_stream(spark, SF_SMALL)
    q = (
        curated_stream(docs)
        .writeStream.format("memory")
        .queryName("curated_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("curated_mem")
    assert streamed.count() == batch.n_unique
    # every survivor passed the quality gate: langs restricted
    langs = {r.lang for r in streamed.select("lang").distinct().collect()}
    assert langs <= {"en", "es", "de", "fr"}


def test_streaming_curation_into_warehouse_exactly_once(spark, tmp_path):
    batch = q_curation_funnel(spark, SF_SMALL).collect()[0]
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_schema("cur")
    wh.create_table("cur", "docs_curated", "zstd", 3)

    docs = read_documents_stream(spark, SF_SMALL)
    stream_curated_into_warehouse(
        docs, wh, "cur", "docs_curated", str(tmp_path / "ckpt")
    )
    out = wh.read("cur", "docs_curated")
    assert out.count() == batch.n_unique
    # restart with the same checkpoint: no new data -> no duplicates
    docs2 = read_documents_stream(spark, SF_SMALL)
    stream_curated_into_warehouse(
        docs2, wh, "cur", "docs_curated", str(tmp_path / "ckpt")
    )
    assert wh.read("cur", "docs_curated").count() == batch.n_unique
    # survivors are unique by content digest
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), "\\s+", " ")))
    n_digests = (
        wh.read("cur", "docs_curated")
        .select(F.md5(norm.cast("binary")).alias("d"))
        .distinct()
        .count()
    )
    assert n_digests == batch.n_unique
