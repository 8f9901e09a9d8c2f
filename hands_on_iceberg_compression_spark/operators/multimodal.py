"""Multimodal-column plumbing: opaque binary payloads with typed metadata.

Training-data-pipeline surface (north-star extension).  The container has no
image/audio codecs, so the *decode* step is a clearly-marked deterministic
stub (``_fake_decode``) — but every Spark-side piece is real and tested: the
binary column, the metadata struct, the Arrow-batched ``mapInPandas``
signature, and the partition-parallel execution shape.

Scale design: `mapInPandas` streams Arrow record batches through Python — the
only sanctioned Python hot path.  Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``; payload bytes never hit the
driver.  Frame sampling is pure JVM (`sequence` + `explode`).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table

FRAME_STRIDE = 50  # "sample a frame" every 50 chars of payload


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal layout: (doc_id, payload binary, meta struct).

    Stands in for (image_bytes, {mime, width, height, n_frames}) columns of a
    real multimodal dataset."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("application/x-fake-image").alias("mime"),
        F.pmod(F.col("doc_id"), F.lit(640)).cast("int").alias("width"),
        F.pmod(F.col("doc_id"), F.lit(480)).cast("int").alias("height"),
        F.floor(F.length(F.col("text")) / FRAME_STRIDE).cast("int").alias("n_frames"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """STUB for a real image/audio decoder (no codec libs in this container).

    Deterministic 8-d fake feature: byte-histogram moments.  Replace with e.g.
    PIL/torchvision decode in a real deployment — the Spark plumbing
    (signature, schema, batching) stays identical."""
    if not payload:
        return [0.0] * 8
    arr = list(payload[:1024])
    n = len(arr)
    mean = sum(arr) / n
    var = sum((x - mean) ** 2 for x in arr) / n
    return [
        float(n),
        round(mean, 4),
        round(var, 4),
        float(min(arr)),
        float(max(arr)),
        float(arr[0]),
        float(arr[-1]),
        float(sum(arr) % 997),
    ]


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "crc32": payloads.map(lambda b: zlib.crc32(b) & 0xFFFFFFFF),
                "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                "feature": payloads.map(_fake_decode),
            }
        )


def q_mm_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction via mapInPandas.

    The feature vector crosses the UDF boundary as a real array<double>
    (that is the plumbing under test); the driver-facing projection joins
    it to a string because the driver canonicalizer dies on list cells
    (same class as the r01 gen_narrow_sample ERROR)."""
    docs = load_table(spark, sf, "documents")
    feats = with_binary_payload(docs).mapInPandas(_extract_features, _FEATURE_SCHEMA)
    return feats.withColumn(
        "feature",
        F.array_join(F.transform(F.col("feature"), lambda x: x.cast("string")), ","),
    )


def q_mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling: explode one row per sampled frame index — pure JVM."""
    docs = load_table(spark, sf, "documents")
    mm = with_binary_payload(docs)
    n_frames = F.col("meta.n_frames")
    return (
        mm.filter(n_frames > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("fi"),
        )
        .select(
            "doc_id",
            F.col("fi").cast("long").alias("frame_idx"),
            (F.col("fi").cast("long") * FRAME_STRIDE).alias("byte_offset"),
        )
    )


def q_mm_meta_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate over the typed metadata struct (no payload touched —
    column pruning must drop the binary column from the scan)."""
    docs = load_table(spark, sf, "documents")
    mm = with_binary_payload(docs)
    return mm.agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.sum(F.col("meta.n_frames")).alias("total_frames"),
        F.max(F.col("meta.width")).alias("max_width"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized_crc32", T.LongType()),
    ]
)

RESIZE_FACTOR = 2  # halve each dimension


def _fake_resize(payload: bytes, factor: int) -> bytes:
    """STUB for a real image resampler (no codec libs in this container).

    Deterministic stand-in: nearest-neighbor on the byte stream (every
    factor^2-th byte — the area ratio of a 2D downscale).  Swap for
    PIL.Image.resize in a real deployment; the Spark plumbing (Arrow batch
    in, new payload + updated metadata out) is what's under test."""
    return payload[:: factor * factor]


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: _fake_resize(bytes(b), RESIZE_FACTOR))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len),
                "resized_bytes": resized.map(len),
                "new_width": (pdf["width"] // RESIZE_FACTOR).astype("int32"),
                "new_height": (pdf["height"] // RESIZE_FACTOR).astype("int32"),
                "resized_crc32": resized.map(lambda b: zlib.crc32(b) & 0xFFFFFFFF),
            }
        )


def mm_resize_full(spark: SparkSession, sf: str) -> DataFrame:
    """Resize with the content crc of the resampled bytes — proves payload
    bytes flow through the UDF; tested in pytest, not driver-exposed (the
    crc is not SQL-expressible)."""
    docs = load_table(spark, sf, "documents")
    mm = with_binary_payload(docs).select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return mm.mapInPandas(_resize_batches, _RESIZE_SCHEMA)


def q_mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Resize: Arrow-batched payload resampling with metadata update — the
    third leg of the decode/extract/resize/frame-sample multimodal quartet.
    Driver projection keeps the SQL-expressible columns (sizes + new dims)
    so the full DuckDB oracle applies; the content crc variant is
    mm_resize_full (pytest-checked)."""
    return mm_resize_full(spark, sf).drop("resized_crc32")


QUERIES: dict[str, Query] = {
    "mm_extract_features": Query(
        q_mm_features,
        None,  # Python mapInPandas path; rows-only driver check
        "multimodal: Arrow-batched feature extraction over binary payloads",
    ),
    "mm_frame_sample": Query(
        q_mm_frame_sample,
        f"""
SELECT doc_id, unnest(generate_series(0, CAST(floor(length(text) / {FRAME_STRIDE}) AS BIGINT) - 1)) AS frame_idx,
       unnest(generate_series(0, CAST(floor(length(text) / {FRAME_STRIDE}) AS BIGINT) - 1)) * {FRAME_STRIDE} AS byte_offset
FROM documents WHERE CAST(floor(length(text) / {FRAME_STRIDE}) AS BIGINT) > 0
""",
        "multimodal: frame-index sampling (JVM-side explode)",
    ),
    "mm_meta_stats": Query(
        q_mm_meta_stats,
        f"""
SELECT count(*) AS n_assets, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(sum(CAST(floor(length(text) / {FRAME_STRIDE}) AS BIGINT)) AS BIGINT) AS total_frames,
       max(CAST(doc_id % 640 AS INTEGER)) AS max_width
FROM documents
""",
        "multimodal: metadata-struct aggregation with payload pruning",
    ),
    "mm_resize": Query(
        q_mm_resize,
        f"""
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       CAST(ceil(octet_length(encode(text)) / {RESIZE_FACTOR * RESIZE_FACTOR}.0) AS BIGINT) AS resized_bytes,
       CAST((doc_id % 640) // {RESIZE_FACTOR} AS INTEGER) AS new_width,
       CAST((doc_id % 480) // {RESIZE_FACTOR} AS INTEGER) AS new_height
FROM documents
""",
        "multimodal: Arrow-batched resize with metadata update",
    ),
}
