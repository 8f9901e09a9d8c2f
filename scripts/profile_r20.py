#!/usr/bin/env python
"""Round-19 optimization profiler (guide §1: measure first).

Modes:
  --plans   capture .explain("formatted") for every HEADLINE query into
            plans/r20/<name>_<tag>.txt (driver-only work, no execution)
  --time    per-query timing split: build (plan construction) vs first
            collect vs warm best-of-3 (bench methodology) — one JSON line
            per query on stdout
  --only    comma-separated query names (default: all HEADLINE)
  --tag     plan file suffix (default: before)

Timing uses the same action as bench.py (.collect()) so numbers are
comparable with BENCH_r18.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hands_on_iceberg_compression_spark.operators import all_queries
from hands_on_iceberg_compression_spark.session import make_session

HEADLINE = [
    "count_star", "filter_eq_string", "filter_between", "like_common",
    "flagship_conjunction", "scan_limit", "sort_limit", "group_agg",
    "per_minute_rollup", "distinct_count", "join_broadcast_star",
    "join_shuffle_agg", "tpch_q3_shape", "window_topn", "asof_join",
    "sessionize", "range_join_banded", "tpch_q6_shape", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "sim_knn_bruteforce",
    "text_quality_score", "text_word_freq_topk", "dedup_keep_latest",
    "tpch_q1_shape",
]

RUNS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in args.only.split(",") if n] or HEADLINE

    spark = make_session(app_name="profile_r20")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r20"
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        q = queries[name]
        if args.plans:
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            t_plan = time.perf_counter() - t0
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(
                json.dumps(
                    {
                        "name": name,
                        "build_s": round(t_build, 4),
                        "optimize_s": round(t_plan, 4),
                        "plan": os.path.relpath(path),
                        "exchanges": plan.count("Exchange"),
                        "codegen_spans": plan.count("WholeStageCodegen"),
                        "python_nodes": plan.count("EvalPython")
                        + plan.count("MapInPandas")
                        + plan.count("ArrowEval"),
                    }
                ),
                flush=True,
            )
        if args.time:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.collect()
            t_first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.perf_counter()
                q.build(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            print(
                json.dumps(
                    {
                        "name": name,
                        "build_s": round(t_build, 4),
                        "first_s": round(t_first, 4),
                        "warm_best_s": round(best, 4),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
