"""Semantic properties of the training-pipeline operators — invariants the
oracle comparison alone does not state explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators.dedup import (
    q_dedup_cluster_sizes,
)
from hands_on_iceberg_compression_spark.operators.textops import (
    EVAL_MOD,
    q_contamination_check,
    q_curation_funnel,
    q_sample_stratified,
)

from tests.conftest import SF_ORACLE


def test_contamination_never_flags_eval_docs(spark):
    """Contamination reports training docs only — eval-set members must
    never appear as 'contaminated by themselves'."""
    out = q_contamination_check(spark, SF_ORACLE).collect()
    assert out, "contamination check returned no rows"
    for r in out:
        assert r.doc_id % EVAL_MOD != 0
        assert r.n_shared_shingles >= 1


def test_curation_funnel_is_monotone(spark):
    """Each funnel stage can only shrink the corpus."""
    row = q_curation_funnel(spark, SF_ORACLE).collect()[0]
    assert row.n_raw >= row.n_quality >= row.n_unique >= row.n_sampled
    assert row.n_sampled >= 0


def test_stratified_sample_rates_within_bounds(spark):
    """Achieved per-language rate must sit near the configured rate — the
    hash-mod admission is uniform over doc_id, so the tolerance is loose
    but the ordering en < others must hold (en is downsampled hardest)."""
    rows = {r.lang: r for r in q_sample_stratified(spark, SF_ORACLE).collect()}
    assert set(rows) >= {"en", "es", "de", "fr"}
    for r in rows.values():
        assert 0.0 <= r.achieved_rate <= 1.0
        assert r.n_sampled <= r.n_total
    assert rows["en"].achieved_rate < rows["es"].achieved_rate


def test_cluster_sizes_count_components_not_pairs(spark):
    """Every reported component has >= 2 members (singletons are not in the
    edge graph), and the histogram is over components, not edges."""
    rows = q_dedup_cluster_sizes(spark, SF_ORACLE).collect()
    assert rows, "no near-dup clusters found at oracle sf"
    for r in rows:
        assert r.cluster_size >= 2
        assert r.n_clusters >= 1


def test_cluster_membership_consistent_with_pairs(spark):
    """Total clustered docs == distinct vertices of the verified pair graph."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        _verified_near_dup_pairs,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    pairs = _verified_near_dup_pairs(docs)
    verts = (
        pairs.select(F.col("doc_a").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("v")))
        .distinct()
        .count()
    )
    total_members = (
        q_dedup_cluster_sizes(spark, SF_ORACLE)
        .agg(F.sum(F.col("cluster_size") * F.col("n_clusters")))
        .collect()[0][0]
    )
    assert total_members == verts


def test_mm_resize_bytes_flow_through_udf(spark):
    """The resized payload content (not just lengths) must cross the Arrow
    boundary — crc of the resampled bytes matches a host-side recompute."""
    import zlib

    from hands_on_iceberg_compression_spark.operators.multimodal import (
        RESIZE_FACTOR,
        _fake_resize,
        mm_resize_full,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    out = {r.doc_id: r for r in mm_resize_full(spark, SF_ORACLE).collect()}
    docs = load_table(spark, SF_ORACLE, "documents").limit(20).collect()
    for d in docs:
        expect = zlib.crc32(_fake_resize(d.text.encode(), RESIZE_FACTOR)) & 0xFFFFFFFF
        assert out[d.doc_id].resized_crc32 == expect
        assert out[d.doc_id].new_width == (d.doc_id % 640) // RESIZE_FACTOR


def test_simhash_near_dup_recall_is_exact(spark):
    """Pigeonhole property: banded blocking must find EVERY pair within
    HAMMING_MAX — compare against a host-side brute-force Hamming scan of
    the collected signatures."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        HAMMING_MAX,
        _simhash_df,
        q_simhash_near_dup,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    sigs = sorted((r.doc_id, r.simhash) for r in _simhash_df(docs).collect())
    expect = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if bin(sigs[i][1] ^ sigs[j][1]).count("1") <= HAMMING_MAX:
                expect.add((sigs[i][0], sigs[j][0]))
    got = {(r.doc_a, r.doc_b) for r in q_simhash_near_dup(spark, SF_ORACLE).collect()}
    assert got == expect
    assert expect, "fixture should contain at least one simhash near-dup pair"
