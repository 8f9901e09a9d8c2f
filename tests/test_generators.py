"""Unit tests for the data-generation DSL (SURVEY.md §2-A, §5):
bounds, null-rate tolerance, determinism, enum dictionary bit-exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.functions.generators import generate_df
from hands_on_iceberg_compression_spark.functions.prng import generate_random_strings
from hands_on_iceberg_compression_spark.schema.reference_schemas import (
    narrow_example_config,
    wide_events_config,
)
from hands_on_iceberg_compression_spark.schema.specs import struct_type


def test_prng_matches_reference_bit_exact():
    # expected values produced by running the reference's mulberry32 +
    # generateRandomStrings (utils.ts:40-69) under node
    assert generate_random_strings(5, 1) == ["m", "A", "g", "8", "8"]
    assert generate_random_strings(8, 1) == ["m", "A", "g", "8", "8", "R", "l", "s"]
    assert generate_random_strings(3, 1) == ["m", "A", "g"]
    assert generate_random_strings(6, 8) == [
        "mAg88Rls", "a9ceIZPJ", "eEYvRLCa", "kxSMohvL", "scv9OuJU", "ZPJtjHQD",
    ]


def test_narrow_bounds_and_nulls(spark):
    cfg = narrow_example_config()
    df = generate_df(spark, cfg, start_id=1, num_rows=5000, seed=7).cache()
    row = df.agg(
        F.min("age").alias("age_min"),
        F.max("age").alias("age_max"),
        F.min("amount").alias("amt_min"),
        F.max("amount").alias("amt_max"),
        F.min("created_at").alias("ts_min"),
        F.max("created_at").alias("ts_max"),
        F.avg(F.col("age").isNull().cast("int")).alias("age_null_rate"),
        F.avg(F.col("note").isNull().cast("int")).alias("note_null_rate"),
        F.countDistinct("status").alias("n_status"),
        F.min(F.length("user_name")).alias("un_len_min"),
        F.max(F.length("user_name")).alias("un_len_max"),
    ).collect()[0]
    assert 18 <= row.age_min and row.age_max <= 78
    assert 0 <= row.amt_min and row.amt_max < 10000
    assert str(row.ts_min) >= "2024-01-01"
    assert str(row.ts_max) < "2025-01-01"
    assert 0.01 < row.age_null_rate < 0.06  # p=0.03
    assert 0.07 < row.note_null_rate < 0.14  # p=0.1
    assert row.n_status == 4
    assert row.un_len_min == row.un_len_max == 16
    # array lengths within [1, 3]; elements from the enum dictionary
    tag_stats = (
        df.filter(F.col("tags").isNotNull())
        .agg(F.min(F.size("tags")), F.max(F.size("tags")))
        .collect()[0]
    )
    assert tag_stats[0] >= 1 and tag_stats[1] <= 3
    bad = (
        df.filter(F.col("tags").isNotNull())
        .select(F.explode("tags").alias("t"))
        .filter(~F.col("t").isin("alpha", "beta", "gamma", "delta"))
        .count()
    )
    assert bad == 0
    df.unpersist()


def test_determinism_independent_of_partitioning(spark):
    cfg = narrow_example_config()
    a = generate_df(spark, cfg, 1, 2000, seed=3, num_partitions=1)
    b = generate_df(spark, cfg, 1, 2000, seed=3, num_partitions=16)
    # identical content regardless of partition layout (xxhash64-of-id draws)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_seed_changes_data(spark):
    cfg = narrow_example_config()
    a = generate_df(spark, cfg, 1, 500, seed=1)
    b = generate_df(spark, cfg, 1, 500, seed=2)
    assert a.exceptAll(b).count() > 0


def test_wide_schema_shape(spark):
    cfg = wide_events_config()
    df = generate_df(spark, cfg, 1, 100, seed=1)
    assert len(df.columns) == 90
    assert df.columns[0] == "id"
    # string length honored beyond the reference's silent 32-char truncation
    r = df.agg(
        F.max(F.length("row_32")).alias("l32"),
        F.max(F.length("row_73")).alias("l73"),
        F.countDistinct("row_28").alias("e28"),
    ).collect()[0]
    assert r.l32 == 35  # reference bug fixed: declared 35, reference emitted 32
    assert r.l73 == 32
    assert r.e28 <= 5
    # ids are the requested sequence
    ids = [x.id for x in df.select("id").orderBy("id").collect()]
    assert ids == list(range(1, 101))


def test_struct_type_matches_generated(spark):
    cfg = narrow_example_config()
    df = generate_df(spark, cfg, 1, 10)
    expected = struct_type(cfg)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    assert got == want
