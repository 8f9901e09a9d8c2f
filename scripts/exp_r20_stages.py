#!/usr/bin/env python
"""Round-20 optimization experiments (guide §1.4: noop sink isolation).

The r19 plan dumps show the dominant defect in both heavy dedup queries:
the LSH/shingle self-join's right side is a BroadcastExchange that REBUILDS
the whole upstream pipeline (64-agg signature stage / doc-frequency window
stage) instead of reusing the left side's work.  Candidates:

  minhash   V0 current | V1 +localCheckpoint(bands) | V2 V1+packed single-
            long band key | V3 V2+shared checkpointed verify words
  ngram     N0 current | N1 +localCheckpoint(filtered shingles)
  knn       K0 current | K1 checkpointed unit-vector frame
  quality   Q0 current | Q1 regexp_count digits | Q2 Q1+regexp_count stopwords
            (equality-checked: oracle-facing query, results must be identical)

Every variant is result-equality-checked against the current implementation
before its timing is trusted.

Usage: python scripts/exp_r20_stages.py <mode> [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.session import make_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label: str, fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:58s} {best:8.3f} s", flush=True)
    return best


def interleaved(labels_fns: list, runs: int = 4) -> None:
    """Interleave variants round-robin so host drift hits all equally."""
    best = [float("inf")] * len(labels_fns)
    for _ in range(runs):
        for i, (_, fn) in enumerate(labels_fns):
            t0 = time.perf_counter()
            fn()
            best[i] = min(best[i], time.perf_counter() - t0)
    for (label, _), b in zip(labels_fns, best):
        print(f"[interleaved] {label:44s} {b:8.3f} s", flush=True)


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def rows_equal(a: DataFrame, b: DataFrame, sort_cols: list) -> bool:
    ra = sorted(tuple(r) for r in a.select(*sort_cols).collect())
    rb = sorted(tuple(r) for r in b.select(*sort_cols).collect())
    same = ra == rb
    print(f"  equality: {len(ra)} vs {len(rb)} rows -> {'OK' if same else 'MISMATCH'}", flush=True)
    if not same:
        only_a = [r for r in ra if r not in set(rb)][:5]
        only_b = [r for r in rb if r not in set(ra)][:5]
        print(f"  only_a={only_a}\n  only_b={only_b}", flush=True)
    return same


# ---------------------------------------------------------------- minhash

def minhash_variants(spark, docs):
    from hands_on_iceberg_compression_spark.operators import dedup as D

    rows_per_band = D.MINHASH_PERMS // D.LSH_BANDS

    def sig_frame(shingles):
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(D.MINHASH_PERMS)
        ]
        return (
            shingles.groupBy("doc_id")
            .agg(*aggs)
            .select(
                "doc_id",
                F.array(*[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]).alias("sig"),
            )
        )

    def bands_struct(sig):
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ]
                            ).alias("bucket"),
                        )
                        for b in range(D.LSH_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    def bands_packed(sig):
        # band id hashed INTO the bucket: one long key, band distinctness
        # preserved w.h.p. (2^-64 cross-band collision = the accepted class)
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(D.LSH_BANDS)
                    ]
                )
            ).alias("bkt"),
        )

    def cands_from(bands, keys):
        a = bands.alias("a")
        b = bands.alias("b")
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
        return (
            a.join(b, cond)
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )

    def verify(cands, words):
        wa = words.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a"))
        wb = words.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b"))
        inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
        union = F.size(F.array_union(F.col("ws_a"), F.col("ws_b")))
        return (
            cands.join(wa, "doc_a")
            .join(wb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(inter.cast("double") / union, 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= D.MINHASH_JACCARD_THRESHOLD)
        )

    def v0():
        return D._verified_near_dup_pairs(docs)

    def v1():
        bands = bands_struct(sig_frame(D._shingle_df(docs))).localCheckpoint(eager=True)
        return verify(cands_from(bands, ["band", "bucket"]), D._with_trigram_hashes(docs, "ws"))

    def v2():
        bands = bands_packed(sig_frame(D._shingle_df(docs))).localCheckpoint(eager=True)
        return verify(cands_from(bands, ["bkt"]), D._with_trigram_hashes(docs, "ws"))

    def v3():
        bands = bands_packed(sig_frame(D._shingle_df(docs))).localCheckpoint(eager=True)
        words = D._with_trigram_hashes(docs, "ws").localCheckpoint(eager=True)
        return verify(cands_from(bands, ["bkt"]), words)

    def v2nc():  # packed key, NO checkpoint (isolates the two effects)
        bands = bands_packed(sig_frame(D._shingle_df(docs)))
        return verify(cands_from(bands, ["bkt"]), D._with_trigram_hashes(docs, "ws"))

    return {"V0 current": v0, "V1 ckpt bands": v1, "V2 ckpt+packed": v2,
            "V3 V2+ckpt words": v3, "V2nc packed only": v2nc}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    spark = make_session(app_name=f"exp_r20_{args.mode}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    runs = args.runs

    from hands_on_iceberg_compression_spark.sources.fixtures import load_table

    if args.mode == "minhash":
        docs = load_table(spark, SF, "documents")
        vs = minhash_variants(spark, docs)
        # equality first (collects, also warms)
        base = vs["V0 current"]()
        for name in ["V1 ckpt bands", "V2 ckpt+packed", "V3 V2+ckpt words"]:
            print(name, flush=True)
            assert rows_equal(base, vs[name](), ["doc_a", "doc_b", "jaccard"])
        interleaved([(n, (lambda f=f: noop(f()))) for n, f in vs.items()], runs)

    elif args.mode == "ngram":
        from hands_on_iceberg_compression_spark.operators import dedup as D
        from pyspark.sql.window import Window

        docs = load_table(spark, SF, "documents")

        def n0():
            return D.q_ngram_jaccard_topk(spark, SF)

        def n1():
            words = D._with_trigram_hashes(docs).localCheckpoint(eager=True)
            sh_all = words.select("doc_id", F.explode(F.col("grams")).alias("sh"))
            sh = (
                sh_all.withColumn("df", F.count("*").over(Window.partitionBy("sh")))
                .filter(F.col("df") <= D.NGRAM_MAX_DF)
                .select("doc_id", "sh")
                .localCheckpoint(eager=True)
            )
            sizes = words.select("doc_id", F.size(F.col("grams")).alias("n_sh"))
            a = sh.alias("a")
            b = sh.alias("b")
            common = (
                a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
                .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .agg(F.count("*").alias("common"))
            )
            sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
            sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
            jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common"))
            return (
                common.join(F.broadcast(sa), "doc_a")
                .join(F.broadcast(sb), "doc_b")
                .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
                .orderBy(F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b"))
                .limit(D.TOPK_PAIRS)
            )

        print("equality n0 vs n1", flush=True)
        assert rows_equal(n0(), n1(), ["doc_a", "doc_b", "jaccard"])
        interleaved([("N0 current", lambda: n0().collect()),
                     ("N1 ckpt shingles", lambda: n1().collect())], runs)

    elif args.mode == "knn":
        from hands_on_iceberg_compression_spark.operators import similarity as S
        from pyspark.sql.window import Window

        emb = load_table(spark, SF, "embeddings")

        def k0():
            return S.q_knn_bruteforce(spark, SF)

        def k1():
            unit = S._with_unit(emb, "embedding", "u").select("vec_id", "u").localCheckpoint(
                eager=True
            )
            queries = unit.filter(F.col("vec_id") < S.N_QUERIES).select(
                F.col("vec_id").alias("q_id"), F.col("u").alias("q_u")
            )
            cands = unit.select(F.col("vec_id").alias("n_id"), F.col("u").alias("n_u"))
            sim = S._dot(F.col("q_u"), F.col("n_u"))
            w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
            return (
                cands.join(F.broadcast(queries), F.col("q_id") != F.col("n_id"))
                .select("q_id", "n_id", sim.alias("sim"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= S.TOPK)
                .select("q_id", "n_id", F.round(F.col("sim"), 6).alias("sim"), "rank")
            )

        print("equality k0 vs k1", flush=True)
        assert rows_equal(k0(), k1(), ["q_id", "n_id", "sim", "rank"])
        interleaved([("K0 current", lambda: k0().collect()),
                     ("K1 ckpt units", lambda: k1().collect())], runs)

    elif args.mode == "quality":
        from hands_on_iceberg_compression_spark.operators import textops as T

        docs = load_table(spark, SF, "documents")

        def q0():
            return T.q_quality_score(spark, SF)

        def q1():  # digits via regexp_count; toks projected once
            toks_df = docs.select("doc_id", "text", F.split(F.col("text"), " ").alias("toks"))
            toks = F.col("toks")
            n = F.size(toks)
            stop_n = F.size(F.filter(toks, lambda w: T._any_eq(w, T._STOPWORDS)))
            digit_n = F.regexp_count(F.col("text"), F.lit("[0-9]"))
            uniq_n = F.size(F.array_distinct(toks))
            return toks_df.select(
                "doc_id",
                F.length("text").alias("n_chars_obs"),
                n.alias("n_tokens"),
                F.round(stop_n.cast("double") / n, 4).alias("stopword_ratio"),
                F.round(digit_n.cast("double") / F.length("text"), 4).alias("digit_ratio"),
                F.round(uniq_n.cast("double") / n, 4).alias("distinct_ratio"),
            )

        def q2():  # stopwords via lookaround regexp_count too
            pat = "(?<=^| )(" + "|".join(T._STOPWORDS) + ")(?=$| )"
            toks_df = docs.select("doc_id", "text", F.split(F.col("text"), " ").alias("toks"))
            toks = F.col("toks")
            n = F.size(toks)
            stop_n = F.regexp_count(F.col("text"), F.lit(pat))
            digit_n = F.regexp_count(F.col("text"), F.lit("[0-9]"))
            uniq_n = F.size(F.array_distinct(toks))
            return toks_df.select(
                "doc_id",
                F.length("text").alias("n_chars_obs"),
                n.alias("n_tokens"),
                F.round(stop_n.cast("double") / n, 4).alias("stopword_ratio"),
                F.round(digit_n.cast("double") / F.length("text"), 4).alias("digit_ratio"),
                F.round(uniq_n.cast("double") / n, 4).alias("distinct_ratio"),
            )

        cols = ["doc_id", "n_chars_obs", "n_tokens", "stopword_ratio", "digit_ratio", "distinct_ratio"]
        print("equality q0 vs q1", flush=True)
        assert rows_equal(q0(), q1(), cols)
        print("equality q0 vs q2", flush=True)
        assert rows_equal(q0(), q2(), cols)
        interleaved([("Q0 current", lambda: q0().collect()),
                     ("Q1 regexp digits", lambda: q1().collect()),
                     ("Q2 Q1+regexp stopwords", lambda: q2().collect())], runs)

    if args.mode == "minhash2":
        # VERDICT r19 #1(b)/(c): candidate-vs-verified pair stats + the
        # signature-stage alternatives (measure, don't assume).
        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents")
        sh = D._shingle_df(docs)

        # (b) pair economics: how much does the verify join actually chew?
        rows_per_band = D.MINHASH_PERMS // D.LSH_BANDS
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(D.MINHASH_PERMS)
        ]
        sig = (
            sh.groupBy("doc_id").agg(*aggs)
            .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]).alias("sig"))
        )
        bands = sig.select(
            "doc_id",
            F.explode(F.array(*[
                F.xxhash64(F.lit(b), *[
                    F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ]) for b in range(D.LSH_BANDS)
            ])).alias("bkt"),
        )
        a, b = bands.alias("a"), bands.alias("b")
        raw_pairs = a.join(
            b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        n_raw = raw_pairs.count()
        n_cand = raw_pairs.distinct().count()
        n_verified = D._verified_near_dup_pairs(docs).count()
        print(f"raw bucket pairs={n_raw}  distinct cands={n_cand}  verified={n_verified}", flush=True)

        # (c) signature-stage alternatives, noop-isolated
        def sig_flat():
            noop(sig)

        # VERDICT's "4 structs of 16 aggs" has no semantics-preserving
        # reading: min() over a struct/array is LEXICOGRAPHIC, not
        # elementwise, so fewer-buffer struct aggs cannot compute per-
        # permutation minima.  The only honest fewer-buffer shape is the
        # explode + two-level agg below.

        def sig_minby_explode():  # explode (perm, hash) rows -> min per (doc, perm)
            perms = F.array(*[F.lit(i) for i in range(D.MINHASH_PERMS)])
            exploded = sh.select(
                "doc_id", F.explode(perms).alias("p"), F.col("sh")
            ).select("doc_id", "p", F.xxhash64(F.col("sh"), F.col("p")).alias("h"))
            m = exploded.groupBy("doc_id", "p").agg(F.min("h").alias("mh"))
            noop(m)

        interleaved([
            ("SIG flat 64 aggs (current)", sig_flat),
            ("SIG explode+min per (doc,perm)", sig_minby_explode),
        ], runs)

    if args.mode == "minhash3":
        # verify-join direction: current plan broadcasts the FULL-corpus
        # trigram arrays (two 5000-array hash relations); alternative keeps
        # the tiny candidate side as the build side both times.
        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents")

        def w0():
            return D._verified_near_dup_pairs(docs)

        def w1():
            sh = D._shingle_df(docs)
            rows_per_band = D.MINHASH_PERMS // D.LSH_BANDS
            aggs = [
                F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
                for i in range(D.MINHASH_PERMS)
            ]
            sig = (
                sh.groupBy("doc_id").agg(*aggs)
                .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]).alias("sig"))
            )
            bands = sig.select(
                "doc_id",
                F.explode(F.array(*[
                    F.xxhash64(F.lit(b), *[
                        F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]) for b in range(D.LSH_BANDS)
                ])).alias("bkt"),
            )
            a, b = bands.alias("a"), bands.alias("b")
            cands = (
                a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .distinct()
            )
            words = D._with_trigram_hashes(docs, "ws")
            wa = words.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a"))
            wb = words.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b"))
            # build side = the small frames (cands, then cands+ws_a)
            step1 = wa.join(F.broadcast(cands), "doc_a")
            step2 = wb.join(F.broadcast(step1), "doc_b")
            inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
            union = F.size(F.array_union(F.col("ws_a"), F.col("ws_b")))
            return step2.select(
                "doc_a", "doc_b",
                F.round(inter.cast("double") / union, 6).alias("jaccard"),
            ).filter(F.col("jaccard") >= D.MINHASH_JACCARD_THRESHOLD)

        print("equality w0 vs w1", flush=True)
        assert rows_equal(w0(), w1(), ["doc_a", "doc_b", "jaccard"])
        interleaved([("W0 current (bcast words)", lambda: noop(w0())),
                     ("W1 bcast cands", lambda: noop(w1()))], runs)

    if args.mode == "ngramsplit":
        # post-r20-fix stage split of dedup_ngram_jaccard (noop-isolated)
        from pyspark.sql.window import Window

        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents")

        def ckpt_words():
            D._with_trigram_hashes(docs).localCheckpoint(eager=True)

        def window_and_ckpt():
            words = D._with_trigram_hashes(docs).localCheckpoint(eager=True)
            sh_all = words.select("doc_id", F.explode(F.col("grams")).alias("sh"))
            (
                sh_all.withColumn("df", F.count("*").over(Window.partitionBy("sh")))
                .filter(F.col("df") <= D.NGRAM_MAX_DF)
                .select("doc_id", "sh")
                .localCheckpoint(eager=True)
            )

        def full():
            noop(D.q_ngram_jaccard_topk(spark, SF))

        interleaved([
            ("NG words ckpt only", ckpt_words),
            ("NG words+window ckpt", window_and_ckpt),
            ("NG full query", full),
        ], runs)

    if args.mode == "ngram2":
        # bucket-pairs formulation: groupBy(sh).collect_list replaces BOTH
        # the doc-frequency window AND the self-join — bucket size IS the
        # document frequency (sh is distinct per doc), so filter(size<=df)
        # is the same cap, and per-bucket pair expansion over a <=100-long
        # sorted array replaces the 1M-row broadcast-hash self-join.
        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents")

        def g0():
            return D.q_ngram_jaccard_topk(spark, SF)

        def g1():
            words = D._with_trigram_hashes(docs).localCheckpoint(eager=True)
            sh_all = words.select("doc_id", F.explode(F.col("grams")).alias("sh"))
            ds = F.array_sort(F.collect_list("doc_id"))
            buckets = (
                sh_all.groupBy("sh")
                .agg(ds.alias("ds"))
                .filter(F.size(F.col("ds")) <= D.NGRAM_MAX_DF)
                .filter(F.size(F.col("ds")) >= 2)
                .select("ds")
            )
            n = F.size(F.col("ds"))
            pair_arr = F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, n - i - 1),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
            pairs = buckets.select(F.explode(pair_arr).alias("p")).select(
                F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
            )
            common = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
            sizes = words.select("doc_id", F.size(F.col("grams")).alias("n_sh"))
            sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
            sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
            jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common"))
            return (
                common.join(F.broadcast(sa), "doc_a")
                .join(F.broadcast(sb), "doc_b")
                .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
                .orderBy(F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b"))
                .limit(D.TOPK_PAIRS)
            )

        print("equality g0 vs g1", flush=True)
        assert rows_equal(g0(), g1(), ["doc_a", "doc_b", "jaccard"])
        interleaved([("G0 current", lambda: g0().collect()),
                     ("G1 bucket pairs", lambda: g1().collect())], runs)

    if args.mode == "minhash4":
        # same bucket-pairs idea for the LSH candidate join
        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents")

        def m0():
            return D._verified_near_dup_pairs(docs)

        def m1():
            sh = D._shingle_df(docs)
            rows_per_band = D.MINHASH_PERMS // D.LSH_BANDS
            aggs = [
                F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
                for i in range(D.MINHASH_PERMS)
            ]
            sig = (
                sh.groupBy("doc_id").agg(*aggs)
                .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]).alias("sig"))
            )
            bands = sig.select(
                "doc_id",
                F.explode(F.array(*[
                    F.xxhash64(F.lit(b), *[
                        F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]) for b in range(D.LSH_BANDS)
                ])).alias("bkt"),
            )
            ds = F.array_sort(F.collect_list("doc_id"))
            buckets = (
                bands.groupBy("bkt").agg(ds.alias("ds"))
                .filter(F.size(F.col("ds")) >= 2)
                .select("ds")
            )
            n = F.size(F.col("ds"))
            pair_arr = F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, n - i - 1),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
            cands = (
                buckets.select(F.explode(pair_arr).alias("p"))
                .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
                .distinct()
            )
            words = D._with_trigram_hashes(docs, "ws")
            wa = words.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a"))
            wb = words.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b"))
            inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
            union = F.size(F.array_union(F.col("ws_a"), F.col("ws_b")))
            return (
                cands.join(wa, "doc_a")
                .join(wb, "doc_b")
                .select("doc_a", "doc_b",
                        F.round(inter.cast("double") / union, 6).alias("jaccard"))
                .filter(F.col("jaccard") >= D.MINHASH_JACCARD_THRESHOLD)
            )

        print("equality m0 vs m1", flush=True)
        assert rows_equal(m0(), m1(), ["doc_a", "doc_b", "jaccard"])
        interleaved([("M0 current", lambda: noop(m0())),
                     ("M1 bucket pairs", lambda: noop(m1()))], runs)

    if args.mode == "micro":
        from pyspark.sql.window import Window

        from hands_on_iceberg_compression_spark.operators import temporal as T
        from hands_on_iceberg_compression_spark.operators import workload as W

        # sessionize without the event_id tie-break: session assignment
        # depends only on the sorted ts sequence per user (equal-ts
        # permutations move is_new among tied rows but never the boundary
        # count/positions in ts terms), so min/max/count per session are
        # ORDER-INSENSITIVE — exact equality expected, 8B/row less shuffle.
        def s0():
            return T.q_sessionize(spark, SF)

        def s1():
            from pyspark.sql import functions as F
            ev = load_table(spark, SF, "events")
            w = Window.partitionBy("user_id").orderBy("ts")
            prev_ts = F.lag("ts").over(w)
            is_new = F.when(
                prev_ts.isNull()
                | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) >= T.SESSION_GAP_US),
                1,
            ).otherwise(0)
            wc = (
                Window.partitionBy("user_id")
                .orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            tagged = (
                ev.filter(F.col("ts").isNotNull())
                .select("user_id", "ts", is_new.alias("is_new"))
                .select("user_id", "ts", F.sum("is_new").over(wc).alias("sess"))
            )
            return (
                tagged.groupBy("user_id", "sess")
                .agg(
                    F.min("ts").alias("session_start"),
                    F.max("ts").alias("session_end"),
                    F.count("*").alias("n_events"),
                )
                .select("user_id", "session_start", "session_end", "n_events")
            )

        print("equality s0 vs s1", flush=True)
        assert rows_equal(s0(), s1(), ["user_id", "session_start", "session_end", "n_events"])

        # join_shuffle_agg with partial aggregation BELOW the join: sum per
        # l_orderkey first, join 1:1 with orders, re-aggregate.  Float sum
        # reorder CAN change last-ulp bits — only landable if exactly equal.
        def j0():
            return W.QUERIES["join_shuffle_agg"].build(spark, SF)

        def j1():
            from pyspark.sql import functions as F
            li = load_table(spark, SF, "lineitem")
            orders = load_table(spark, SF, "orders")
            pre = li.groupBy("l_orderkey").agg(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
                F.count("*").alias("cnt"),
            )
            return (
                pre.join(orders, pre.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderstatus")
                .agg(
                    F.round(F.sum("rev"), 2).alias("revenue"),
                    F.sum("cnt").alias("line_cnt"),
                )
            )

        print("equality j0 vs j1", flush=True)
        eq = rows_equal(j0(), j1(), ["o_orderstatus", "revenue", "line_cnt"])
        print(f"  j1 landable: {eq}", flush=True)

        fns = [("S0 sessionize current", lambda: s0().collect()),
               ("S1 sessionize no tiebreak", lambda: s1().collect())]
        if eq:
            fns += [("J0 join_shuffle current", lambda: j0().collect()),
                    ("J1 join_shuffle preagg", lambda: j1().collect())]
        interleaved(fns, runs)

    if args.mode == "lev":
        # dedup_levenshtein_blocked: banded levenshtein via the per-row
        # threshold argument (returns -1 above the bound, the TRUE distance
        # otherwise).  thr = floor(0.3*max)+1 is a provable superset of the
        # FP predicate dist/max <= 0.3 (dist <= 0.3*max + eps < floor+1);
        # the final filter is the ORIGINAL expression on the recovered
        # exact distance, so results are structurally identical.
        from hands_on_iceberg_compression_spark.operators import dedup as D

        docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")

        def l0():
            return D.q_dedup_levenshtein_blocked(spark, SF)

        def l1():
            bucket = F.floor(F.length("text") / D.LEV_BUCKET_CHARS)
            t_ = docs.select("doc_id", "lang", "text", bucket.alias("bucket"))
            a = t_.select(
                F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a"),
                F.col("text").alias("text_a"), F.col("bucket").alias("bucket_a"),
            )
            b = t_.select(
                F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"),
                F.col("text").alias("text_b"), F.col("bucket").alias("bucket_b"),
            )
            max_len = F.greatest(F.length("text_a"), F.length("text_b"))
            thr = (F.floor(F.lit(D.LEV_MAX_DIST_FRAC) * max_len) + F.lit(1)).cast("int")
            d = F.expr(
                f"levenshtein(text_a, text_b, cast(floor({D.LEV_MAX_DIST_FRAC} * "
                f"greatest(length(text_a), length(text_b))) + 1 as int))"
            )
            joined = a.join(
                b,
                (F.col("lang_a") == F.col("lang_b"))
                & (F.col("bucket_a") == F.col("bucket_b"))
                & (F.col("id_a") < F.col("id_b")),
            ).select("id_a", "id_b", "text_a", "text_b", max_len.alias("mx"), d.alias("d"))
            return (
                joined.filter((F.col("d") >= 0) & (F.col("d") / F.col("mx") <= D.LEV_MAX_DIST_FRAC))
                .select(
                    "id_a", "id_b", F.col("d").alias("edit_dist"),
                    F.round(F.col("d") / F.col("mx"), 4).alias("dist_frac"),
                )
            )

        print("equality l0 vs l1 (this SF)", flush=True)
        assert rows_equal(l0(), l1(), ["id_a", "id_b", "edit_dist", "dist_frac"])
        interleaved([("L0 current full lev", lambda: noop(l0())),
                     ("L1 banded threshold", lambda: noop(l1()))], runs)

    if args.mode == "winnow":
        # the mins pass is 97% of the query (9.1 of 9.6 s): interpreted
        # array_min(slice(g, s, W)) allocates a W-array per window.  Both
        # alternatives compute IDENTICAL window minima.
        from pyspark.sql.window import Window

        from hands_on_iceberg_compression_spark.operators import textops as T

        docs = load_table(spark, SF, "documents")

        def base_hashed():
            toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
            n = F.size(F.col("w"))
            grams = F.transform(
                F.sequence(F.lit(1), n - F.lit(T.WINNOW_K - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        " ", *[F.element_at(F.col("w"), i + j) for j in range(T.WINNOW_K)]
                    )
                ),
            )
            return toks.filter(n >= T.WINNOW_K).select(
                "doc_id", grams.alias("g"), (n - F.lit(T.WINNOW_K)).alias("last0")
            )

        def w0():
            return T.q_winnow_fingerprints(spark, SF)

        def w_least():  # (A) least() of guarded element_ats, no slice alloc
            hashed = base_hashed()
            m = F.size(F.col("g"))
            def win_min(s):
                terms = [
                    F.when(s + F.lit(j) <= m, F.element_at(F.col("g"), s + F.lit(j)))
                    for j in range(T.WINNOW_W)
                ]
                return F.least(*terms)
            mins = F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("last0") - F.lit(T.WINNOW_W - 2))),
                win_min,
            )
            return (
                hashed.select("doc_id", F.array_distinct(mins).alias("fps"))
                .select(
                    "doc_id",
                    F.size(F.col("fps")).alias("n_fingerprints"),
                    F.array_join(
                        F.transform(F.array_sort(F.col("fps")), lambda x: x.cast("string")),
                        ",",
                    ).alias("fingerprints"),
                )
            )

        def w_rows():  # (B) explode + codegen'd row-frame window min
            hashed = base_hashed().select("doc_id", "g", F.size(F.col("g")).alias("m"))
            ex = hashed.select(
                "doc_id", "m", F.posexplode(F.col("g")).alias("p", "h")
            )
            w = (
                Window.partitionBy("doc_id")
                .orderBy("p")
                .rowsBetween(Window.currentRow, T.WINNOW_W - 1)
            )
            wm = ex.select(
                "doc_id", "m", "p", F.min("h").over(w).alias("wm")
            ).filter(F.col("p") <= F.greatest(F.col("m") - T.WINNOW_W, F.lit(0)))
            fps = wm.groupBy("doc_id").agg(F.sort_array(F.collect_set("wm")).alias("fps"))
            return fps.select(
                "doc_id",
                F.size(F.col("fps")).alias("n_fingerprints"),
                F.array_join(
                    F.transform(F.col("fps"), lambda x: x.cast("string")), ","
                ).alias("fingerprints"),
            )

        cols = ["doc_id", "n_fingerprints", "fingerprints"]
        print("equality w0 vs least", flush=True)
        assert rows_equal(w0(), w_least(), cols)
        print("equality w0 vs rows-window", flush=True)
        assert rows_equal(w0(), w_rows(), cols)
        interleaved([("WN0 current slice/array_min", lambda: noop(w0())),
                     ("WN1 least of element_ats", lambda: noop(w_least())),
                     ("WN2 explode+window min", lambda: noop(w_rows()))], runs)

    spark.stop()


if __name__ == "__main__":
    main()
