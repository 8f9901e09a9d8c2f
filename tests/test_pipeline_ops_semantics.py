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


def test_cc_labels_reach_verified_fixpoint(spark):
    """_cc_labels stops at a verified fixpoint: one more propagation round
    over the returned labels must change nothing (VERDICT r2 #4)."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        _cc_labels,
        _verified_near_dup_pairs,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    edges = _verified_near_dup_pairs(docs).select("doc_a", "doc_b")
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    labels = _cc_labels(sym).localCheckpoint(eager=True)
    neigh = (
        sym.join(labels, sym.doc_b == labels.v)
        .groupBy(F.col("doc_a").alias("v2"))
        .agg(F.min("label").alias("nmin"))
    )
    changed = (
        labels.join(neigh, labels.v == F.col("v2"), "left")
        .filter(F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
        .count()
    )
    assert changed == 0


def test_cc_raises_when_budget_too_small_for_diameter(spark):
    """A chain component deeper than the round budget must RAISE, not be
    silently split (the ADVICE r2 failure mode)."""
    import pytest

    from hands_on_iceberg_compression_spark.operators.dedup import _cc_labels

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["doc_a", "doc_b"]
    )
    sym = chain.union(
        chain.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_labels(sym, max_iters=2)
    # with budget >= diameter the same chain converges to a single component
    labels = _cc_labels(sym, max_iters=12)
    assert labels.select("label").distinct().count() == 1


def test_embedding_near_dup_refuses_large_corpus(spark, monkeypatch):
    """The exact all-pairs baseline is sf-gated: above ALL_PAIRS_MAX_VECTORS
    it must refuse and point at the LSH twin (VERDICT r2 #3)."""
    import pytest

    from hands_on_iceberg_compression_spark.operators import similarity

    monkeypatch.setattr(similarity, "ALL_PAIRS_MAX_VECTORS", 100)
    with pytest.raises(ValueError, match="sim_near_dup_lsh"):
        similarity.q_embedding_near_dup(spark, SF_ORACLE)


def test_ann_recall_floors(spark):
    """Driver-visible recall@k floors (VERDICT r2 #6).  Measured at sf0.01
    (deterministic — seeded hyperplanes, fixed centroid seeds): multi-probe
    LSH 1.0, IVF 0.90 (saturates at 0.92 regardless of probe count — the
    residual misses are quantization error of 16 training-free centroids on
    a 500-vector corpus; the same index measures 0.98 at sf0.1)."""
    from hands_on_iceberg_compression_spark.operators.similarity import (
        TOPK,
        q_ann_recall,
    )

    rows = {r.method: r for r in q_ann_recall(spark, SF_ORACLE).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert r.n_exact > 0 and r.n_exact % TOPK == 0
    assert rows["lsh"].recall_at_k >= 0.95, rows["lsh"]
    assert rows["ivf"].recall_at_k >= 0.85, rows["ivf"]


def test_pii_scrub_semantics_on_synthetic_corpus(spark, tmp_path):
    """The shipped fixtures contain no PII (all counts 0), so parity there
    proves only plumbing.  This runs the SAME Spark query and DuckDB oracle
    over a synthetic corpus that actually contains emails/IPs/phones and
    compares full results."""
    import duckdb
    import pandas as pd

    from hands_on_iceberg_compression_spark.operators.textops import QUERIES

    rows = [
        (0, "contact me at alice.smith+spam@mail.example.org for details", "en", "web", 0),
        (1, "server 192.168.0.1 and 10.0.0.255 rebooted", "en", "logs", 0),
        (2, "call +15551234567 or +442071838750 now", "en", "web", 0),
        (3, "mixed bob@x.io from 8.8.8.8 dial +77012345678 end", "en", "web", 0),
        (4, "nothing sensitive here at all", "en", "web", 0),
        (5, "not-an-email @ nor an ip 999.999 nor + phone", "en", "web", 0),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    sf_dir = str(tmp_path / "sf")
    import os

    os.makedirs(sf_dir)
    pdf.to_parquet(os.path.join(sf_dir, "documents.parquet"))

    got = (
        QUERIES["text_pii_scrub_stats"].build(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(QUERIES["text_pii_scrub_stats"].oracle)
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_email"].tolist() == want["n_email"].tolist() == [1, 0, 0, 1, 0, 0]
    assert got["n_ipv4"].tolist() == want["n_ipv4"].tolist() == [0, 2, 0, 1, 0, 0]
    assert got["n_phone"].tolist() == want["n_phone"].tolist() == [0, 0, 2, 1, 0, 0]
    assert got["redacted_len"].tolist() == want["redacted_len"].tolist()


def test_repetition_ratio_flags_degenerate_doc(spark, tmp_path):
    """A doc that repeats one phrase must score near 1 on both fractions; a
    doc of distinct words must score 0 on both."""
    import os

    import pandas as pd

    from hands_on_iceberg_compression_spark.operators.textops import QUERIES

    rows = [
        (0, " ".join(["spam ham"] * 20), "en", "web", 0),       # "ham spam" x19 + "spam ham" x20
        (1, "all words here are unique tokens", "en", "web", 0),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    pdf.to_parquet(os.path.join(sf_dir, "documents.parquet"))

    got = (
        QUERIES["text_repetition_ratio"].build(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got.loc[0, "top_bigram_frac"] > 0.5
    assert got.loc[0, "dup_bigram_frac"] > 0.9
    assert got.loc[1, "top_bigram_frac"] < 0.25
    assert got.loc[1, "dup_bigram_frac"] == 0.0


def test_pca_topcomponent_matches_numpy_eigh(spark):
    """The distributed moment-sum + power-iteration PC1 must align with the
    exact eigendecomposition of the same covariance (|cos| >= 0.999)."""
    import numpy as np

    from hands_on_iceberg_compression_spark.operators.similarity import (
        q_pca_topcomponent,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    rows = sorted(q_pca_topcomponent(spark, SF_ORACLE).collect(), key=lambda r: r.dim)
    v = np.array([r.pc1_loading for r in rows])

    mat = np.vstack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in load_table(spark, SF_ORACLE, "embeddings").collect()
        ]
    )
    cov = np.cov(mat, rowvar=False, bias=True)
    eigval, eigvec = np.linalg.eigh(cov)
    top = eigvec[:, -1]

    assert abs(float(v @ top) / np.linalg.norm(v)) >= 0.999
    # reported eigenvalue matches the exact top eigenvalue
    assert abs(rows[0].eigval - float(eigval[-1])) <= 1e-3 * max(1.0, eigval[-1])


def test_approx_quantiles_within_rank_error(spark):
    """Sketch estimates must land within 5% rank error of the exact
    percentile (accuracy=10000 -> 0.01% nominal; 5% is a loose ceiling)."""
    from hands_on_iceberg_compression_spark.operators.advanced import (
        q_approx_quantile_battery,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    got = {r.event_type: r for r in q_approx_quantile_battery(spark, SF_ORACLE).collect()}
    ev = load_table(spark, SF_ORACLE, "events")
    for etype, row in got.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        assert n == row.n
        for p, est in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
            # rank of the estimate must be within 5% of the target rank
            import bisect

            rank = bisect.bisect_left(vals, est)
            assert abs(rank - p * n) <= 0.05 * n + 1, (etype, p, est, rank)


def test_pack_sequences_conservation_and_contiguity(spark):
    """Packing must conserve tokens (no doc lost or double-packed) and fill
    bins contiguously from 0 within each source."""
    from collections import defaultdict

    from hands_on_iceberg_compression_spark.operators.textops import (
        q_pack_sequences,
    )
    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    rows = q_pack_sequences(spark, SF_ORACLE).collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0].t
    total_docs = docs.count()

    assert sum(r.bin_tokens for r in rows) == total_tokens
    assert sum(r.n_docs for r in rows) == total_docs
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r.bin_idx)
        assert r.n_docs >= 1 and r.bin_tokens >= 1
    for source, bins in by_source.items():
        assert sorted(bins) == list(range(len(bins))), source


def test_mixture_sample_quota_and_determinism(spark):
    """Admission never exceeds the per-source quota and is bit-identical
    across independent runs (the retry-reproducibility contract)."""
    from hands_on_iceberg_compression_spark.operators.textops import (
        MIXTURE_CAP_PER_SOURCE,
        q_mixture_sample,
    )

    a = sorted(map(tuple, q_mixture_sample(spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, q_mixture_sample(spark, SF_ORACLE).collect()))
    assert a == b
    assert all(r[1] <= MIXTURE_CAP_PER_SOURCE for r in a)
    # the quota must actually bite somewhere at this sf, else the test is vacuous
    assert any(r[1] == MIXTURE_CAP_PER_SOURCE for r in a)


def test_cohort_retention_week0_is_full(spark):
    """Every user is active in their own first-seen week, so offset-0
    retention is exactly 1.0 for every cohort, and no offset is negative."""
    from hands_on_iceberg_compression_spark.operators.temporal import (
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, SF_ORACLE).collect()
    assert rows
    week0 = {r.cohort_week: r for r in rows if r.week_offset == 0}
    cohorts = {r.cohort_week for r in rows}
    assert set(week0) == cohorts
    for r in week0.values():
        assert r.n_active == r.cohort_size and r.retention == 1.0
    assert all(r.week_offset >= 0 for r in rows)


def test_levenshtein_blocked_finds_planted_near_dup(spark, tmp_path):
    """A planted one-edit pair in the same (lang, length-band) block must
    surface; the pair straddling languages must not (blocking contract)."""
    import shutil

    from hands_on_iceberg_compression_spark.operators.dedup import (
        q_dedup_levenshtein_blocked,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base + "alpha", "en", "s", len(base) + 5),
        (2, base + "alphb", "en", "s", len(base) + 5),  # 1 edit from doc 1
        (3, base + "alpha", "de", "s", len(base) + 5),  # same text, other lang
    ]
    sf = str(tmp_path / "sf")
    for t in ("documents",):
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).coalesce(1).write.parquet(f"{sf}/{t}.parquet")

    got = {(r.id_a, r.id_b): r for r in q_dedup_levenshtein_blocked(spark, sf).collect()}
    assert (1, 2) in got and got[(1, 2)].edit_dist == 1
    assert (1, 3) not in got and (2, 3) not in got
    shutil.rmtree(sf, ignore_errors=True)


def test_tpch_q14_broadcasts_part_dim(spark):
    """The part dimension must come in via a broadcast join — a shuffled
    fact-side exchange on l_partkey would be the 100 TB bottleneck."""
    from hands_on_iceberg_compression_spark.operators.advanced import (
        q_tpch_q14_shape,
    )

    plan = q_tpch_q14_shape(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    row = q_tpch_q14_shape(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= row.promo_revenue_pct <= 100.0


def test_tpch_q4_uses_semi_join(spark):
    """EXISTS must decorrelate to a left-semi join (no row multiplication)."""
    from hands_on_iceberg_compression_spark.operators.advanced import (
        q_tpch_q4_shape,
    )

    plan = q_tpch_q4_shape(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
