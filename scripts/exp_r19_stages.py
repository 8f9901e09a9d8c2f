#!/usr/bin/env python
"""Round-19 stage-split experiments (guide §1.4: noop sink isolation).

Times each sub-pipeline of the three most expensive bench queries with the
noop sink so the computation is measured, not the collect.  Also A/Bs the
candidate optimizations before they land:

  minhash   stage split of dedup_minhash_lsh + signature/bucket variants
  ngram     stage split of dedup_ngram_jaccard
  knn       interpreted-HOF dot vs unrolled codegen dot
  sess      session_window vs lag/cumsum formulation (+ result equality)
  asof      two-scan union vs single-scan isin

Usage: python scripts/exp_r19_stages.py <mode> [--runs N]
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
    """Warm best-of-N of fn() (fn builds AND executes, like bench)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:8.3f} s", flush=True)
    return best


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = make_session(app_name=f"exp_r19_{args.mode}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    runs = args.runs

    if args.mode == "minhash":
        from hands_on_iceberg_compression_spark.operators import dedup as D
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table

        docs = load_table(spark, SF, "documents")
        t("scan only", lambda: noop(docs), runs)
        t("shingles (hashed)", lambda: noop(D._shingle_df(docs)), runs)

        def sig_current():
            sh = D._shingle_df(docs)
            aggs = [
                F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
                for i in range(D.MINHASH_PERMS)
            ]
            noop(sh.groupBy("doc_id").agg(*aggs))

        t("signatures (64x xxhash64)", sig_current, runs)

        def sig_combo():
            sh = D._shingle_df(docs)
            h1 = F.xxhash64(F.col("sh"))
            h2 = F.xxhash64(F.col("sh"), F.lit(1))
            sh2 = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
            aggs = [
                F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"h{i}")
                for i in range(D.MINHASH_PERMS)
            ]
            noop(sh2.groupBy("doc_id").agg(*aggs))

        t("signatures (2 hashes + affine combo)", sig_combo, runs)

        def full_current():
            noop(D._verified_near_dup_pairs(docs))

        t("full verified pairs (current)", full_current, runs)

        # stage split of the current pipeline
        sh = D._shingle_df(docs)
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(D.MINHASH_PERMS)
        ]
        sig = (
            sh.groupBy("doc_id")
            .agg(*aggs)
            .select(
                "doc_id",
                F.array(*[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]).alias("sig"),
            )
        )
        rows_per_band = D.MINHASH_PERMS // D.LSH_BANDS
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.concat_ws(
                                    ",",
                                    F.slice(
                                        F.col("sig"), b * rows_per_band + 1, rows_per_band
                                    ),
                                )
                            ).alias("bucket"),
                        )
                        for b in range(D.LSH_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        a = bands.alias("a")
        b = bands.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        t("bands (to noop)", lambda: noop(bands), runs)
        t("cands (join+distinct, to noop)", lambda: noop(cands), runs)
        n_c = cands.count()
        print(f"  [cands rows: {n_c}]")

    elif args.mode == "minhash2":
        # full-query A/B: current _verified_near_dup_pairs vs the optimized
        # candidate (hash-triple shingles, xor-rotate signature family,
        # multi-arg bucket hash, semi-join-pruned exact verify)
        from hands_on_iceberg_compression_spark.operators import dedup as D
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table

        docs = load_table(spark, SF, "documents")

        def trigram_hashes(words):
            n = F.size(words)
            grams = F.transform(
                F.sequence(F.lit(1), n - F.lit(D.NGRAM_N - 1)),
                lambda i: F.xxhash64(
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                ),
            )
            return F.array_distinct(
                F.when(n >= D.NGRAM_N, grams).otherwise(
                    F.array().cast("array<bigint>")
                )
            )

        def rotl(col, i):
            if i == 0:
                return col
            return F.shiftleft(col, i).bitwiseOR(F.shiftrightunsigned(col, 64 - i))

        def pairs_opt():
            toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("words"))
            sh = toks.select(
                "doc_id", F.explode(trigram_hashes(F.col("words"))).alias("sh")
            )
            h2 = F.xxhash64(F.col("sh"))
            shh = sh.select("doc_id", F.col("sh").alias("h1"), h2.alias("h2"))
            aggs = [
                F.min(F.col("h1").bitwiseXOR(rotl(F.col("h2"), i % 64))).alias(f"h{i}")
                for i in range(D.MINHASH_PERMS)
            ]
            sig = (
                shh.groupBy("doc_id")
                .agg(*aggs)
                .select(
                    "doc_id",
                    F.array(
                        *[F.col(f"h{i}") for i in range(D.MINHASH_PERMS)]
                    ).alias("sig"),
                )
            )
            rpb = D.MINHASH_PERMS // D.LSH_BANDS
            bands = sig.select(
                "doc_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.xxhash64(
                                    *[
                                        F.element_at(F.col("sig"), b * rpb + r + 1)
                                        for r in range(rpb)
                                    ]
                                ).alias("bucket"),
                            )
                            for b in range(D.LSH_BANDS)
                        ]
                    )
                ).alias("bb"),
            ).select(
                "doc_id",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )
            a = bands.alias("a")
            b = bands.alias("b")
            cands = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            ids = (
                cands.select(F.col("doc_a").alias("doc_id"))
                .union(cands.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            cdocs = docs.join(F.broadcast(ids), "doc_id", "left_semi")
            words = D._with_trigram_hashes(cdocs, "ws")
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

        t(
            "current verified pairs (collect+sort)",
            lambda: D._verified_near_dup_pairs(docs)
            .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
            .collect(),
            runs,
        )
        t(
            "optimized verified pairs (collect+sort)",
            lambda: pairs_opt()
            .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
            .collect(),
            runs,
        )
        cur = sorted(map(tuple, D._verified_near_dup_pairs(docs).collect()))
        new = sorted(map(tuple, pairs_opt().collect()))
        print(f"  [results equal: {cur == new}]  cur={len(cur)} new={len(new)}")

    elif args.mode == "ngram2":
        # full-query A/B: current q_ngram_jaccard_topk vs hash-triple variant
        from hands_on_iceberg_compression_spark.operators import dedup as D
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table
        from pyspark.sql.window import Window

        docs = load_table(spark, SF, "documents")

        def trigram_hashes(words):
            n = F.size(words)
            grams = F.transform(
                F.sequence(F.lit(1), n - F.lit(D.NGRAM_N - 1)),
                lambda i: F.xxhash64(
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                ),
            )
            return F.array_distinct(
                F.when(n >= D.NGRAM_N, grams).otherwise(
                    F.array().cast("array<bigint>")
                )
            )

        def ngram_opt():
            toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("words"))
            words = toks.select(
                "doc_id", trigram_hashes(F.col("words")).alias("grams")
            ).localCheckpoint(eager=True)
            sh_all = words.select("doc_id", F.explode(F.col("grams")).alias("sh"))
            sh = (
                sh_all.withColumn("df", F.count("*").over(Window.partitionBy("sh")))
                .filter(F.col("df") <= D.NGRAM_MAX_DF)
                .select("doc_id", "sh")
            )
            sizes = words.select("doc_id", F.size(F.col("grams")).alias("n_sh"))
            a = sh.alias("a")
            b = sh.alias("b")
            common = (
                a.join(
                    b,
                    (F.col("a.sh") == F.col("b.sh"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .agg(F.count("*").alias("common"))
            )
            sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
            sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
            jac = F.col("common").cast("double") / (
                F.col("n_a") + F.col("n_b") - F.col("common")
            )
            return (
                common.join(F.broadcast(sa), "doc_a")
                .join(F.broadcast(sb), "doc_b")
                .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
                .orderBy(F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b"))
                .limit(D.TOPK_PAIRS)
            )

        t(
            "current q_ngram_jaccard_topk (collect)",
            lambda: D.q_ngram_jaccard_topk(spark, SF).collect(),
            runs,
        )
        t("hash-triple variant (collect)", lambda: ngram_opt().collect(), runs)
        cur = sorted(map(tuple, D.q_ngram_jaccard_topk(spark, SF).collect()))
        new = sorted(map(tuple, ngram_opt().collect()))
        print(f"  [results equal: {cur == new}]")

    elif args.mode == "ngram":
        from hands_on_iceberg_compression_spark.operators import dedup as D
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table
        from pyspark.sql.window import Window

        docs = load_table(spark, SF, "documents")

        t(
            "trigram checkpoint (words materialize)",
            lambda: D._with_trigram_hashes(docs).localCheckpoint(eager=True),
            runs,
        )
        words = D._with_trigram_hashes(docs).localCheckpoint(eager=True)
        sh_all = words.select(
            "doc_id", F.explode(F.col("grams")).alias("s0")
        ).select("doc_id", F.xxhash64(F.col("s0")).alias("sh"))
        t("explode+hash shingles from ckpt", lambda: noop(sh_all), runs)
        sh = (
            sh_all.withColumn("df", F.count("*").over(Window.partitionBy("sh")))
            .filter(F.col("df") <= D.NGRAM_MAX_DF)
            .select("doc_id", "sh")
        )
        t("window df filter", lambda: noop(sh), runs)
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("common"))
        )
        t("self-join + pair group", lambda: noop(common), runs)
        from hands_on_iceberg_compression_spark.operators.dedup import q_ngram_jaccard_topk

        t("full query (collect, bench twin)", lambda: q_ngram_jaccard_topk(spark, SF).collect(), runs)

        # variant: groupBy-count df filter instead of window
        cnt = sh_all.groupBy("sh").agg(F.count("*").alias("df"))
        sh_v = (
            sh_all.join(cnt.filter(F.col("df") <= D.NGRAM_MAX_DF), "sh")
            .select("doc_id", "sh")
        )
        t("variant df filter via groupBy+join", lambda: noop(sh_v), runs)

    elif args.mode == "knn":
        from hands_on_iceberg_compression_spark.operators import similarity as S
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table
        from pyspark.sql.window import Window

        t("current q_knn_bruteforce (collect)",
          lambda: S.q_knn_bruteforce(spark, SF).collect(), runs)

        def unrolled_dot(a, b):
            acc = F.lit(0.0)
            for i in range(1, S.EMB_DIM + 1):
                acc = acc + F.element_at(a, i) * F.element_at(b, i)
            return acc

        def unrolled_norm(a):
            acc = F.lit(0.0)
            for i in range(1, S.EMB_DIM + 1):
                x = F.element_at(a, i).cast("double")
                acc = acc + x * x
            return F.sqrt(acc)

        def with_unit_unrolled(df, emb_col, out_col):
            normed = df.withColumn("_norm", unrolled_norm(F.col(emb_col)))
            unit = F.transform(
                F.col(emb_col), lambda x: x.cast("double") / F.col("_norm")
            )
            return normed.withColumn(out_col, unit).drop("_norm")

        def knn_unrolled():
            emb = load_table(spark, SF, "embeddings")
            unit = with_unit_unrolled(emb, "embedding", "u")
            queries = unit.filter(F.col("vec_id") < S.N_QUERIES).select(
                F.col("vec_id").alias("q_id"), F.col("u").alias("q_u")
            )
            cands = unit.select(F.col("vec_id").alias("n_id"), F.col("u").alias("n_u"))
            sim = unrolled_dot(F.col("q_u"), F.col("n_u"))
            w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
            return (
                cands.join(F.broadcast(queries), F.col("q_id") != F.col("n_id"))
                .select("q_id", "n_id", sim.alias("sim"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= S.TOPK)
                .select("q_id", "n_id", F.round(F.col("sim"), 6).alias("sim"), "rank")
            )

        t("unrolled codegen dot (collect)", lambda: knn_unrolled().collect(), runs)
        cur = sorted(map(tuple, S.q_knn_bruteforce(spark, SF).collect()))
        new = sorted(map(tuple, knn_unrolled().collect()))
        print(f"  [results equal: {cur == new}]")

    elif args.mode == "sess":
        from hands_on_iceberg_compression_spark.operators.temporal import (
            SESSION_GAP_US,
            q_sessionize,
        )
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table
        from pyspark.sql.window import Window

        t("current session_window (collect)",
          lambda: q_sessionize(spark, SF).collect(), runs)

        def sess_lag():
            ev = load_table(spark, SF, "events")
            w = Window.partitionBy("user_id").orderBy("ts", "event_id")
            prev = F.lag("ts").over(w)
            is_new = F.when(
                prev.isNull()
                | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) >= SESSION_GAP_US),
                1,
            ).otherwise(0)
            wc = (
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            g = ev.select("user_id", "ts", F.sum(is_new).over(wc).alias("sess"))
            return (
                g.groupBy("user_id", "sess")
                .agg(
                    F.min("ts").alias("session_start"),
                    F.max("ts").alias("session_end"),
                    F.count("*").alias("n_events"),
                )
                .select("user_id", "session_start", "session_end", "n_events")
            )

        t("lag/cumsum formulation (collect)", lambda: sess_lag().collect(), runs)
        cur = sorted(map(tuple, q_sessionize(spark, SF).collect()))
        new = sorted(map(tuple, sess_lag().collect()))
        print(f"  [results equal: {cur == new}]")

    elif args.mode == "asof":
        from hands_on_iceberg_compression_spark.operators.temporal import q_asof_join
        from hands_on_iceberg_compression_spark.sources.fixtures import load_table
        from pyspark.sql.window import Window

        t("current two-scan union (collect)",
          lambda: q_asof_join(spark, SF).collect(), runs)

        def asof_one_scan():
            ev = load_table(spark, SF, "events")
            unioned = ev.filter(
                F.col("event_type").isin("click", "purchase")
            ).select(
                "user_id",
                "ts",
                F.col("event_id").alias("src_id"),
                F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
            )
            w = (
                Window.partitionBy("user_id")
                .orderBy("ts", "is_p", "src_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            click_id = F.last(
                F.when(F.col("is_p") == 0, F.col("src_id")), ignorenulls=True
            ).over(w)
            click_ts = F.last(
                F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True
            ).over(w)
            return (
                unioned.select("*", click_id.alias("click_id"), click_ts.alias("click_ts"))
                .filter((F.col("is_p") == 1) & F.col("click_id").isNotNull())
                .select(
                    F.col("src_id").alias("purchase_id"),
                    "user_id",
                    "click_id",
                    (
                        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))
                    ).alias("gap_us"),
                )
            )

        t("single-scan isin (collect)", lambda: asof_one_scan().collect(), runs)
        cur = sorted(map(tuple, q_asof_join(spark, SF).collect()))
        new = sorted(map(tuple, asof_one_scan().collect()))
        print(f"  [results equal: {cur == new}]")

    else:
        raise SystemExit(f"unknown mode {args.mode}")

    spark.stop()


if __name__ == "__main__":
    main()
