#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Mirrors the reference's measured workload (BASELINE.md): scan/filter/count
shapes, the flagship conjunction, plus this engine's widened surface (joins,
window, dedup, similarity, text).  Timing protocol: per query, run twice and
keep the best (the reference's published numbers are warm best-of-3,
temp.md note in BASELINE.md) — one shared SparkSession, no result caching.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hands_on_iceberg_compression_spark.operators import all_queries
from hands_on_iceberg_compression_spark.session import make_session

HEADLINE = [
    "count_star",
    "filter_eq_string",
    "filter_between",
    "like_common",
    "flagship_conjunction",
    "scan_limit",
    "sort_limit",
    "group_agg",
    "per_minute_rollup",
    "distinct_count",
    "join_broadcast_star",
    "join_shuffle_agg",
    "tpch_q3_shape",
    "window_topn",
    "asof_join",
    "sessionize",
    "range_join_banded",
    "tpch_q6_shape",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
    "text_quality_score",
    "text_word_freq_topk",
]

RUNS = 3  # warm best-of-3 — the reference's published protocol (BASELINE.md)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = make_session(app_name="bench")
    queries = all_queries()

    # JVM/session warmup so fixed startup cost isn't billed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
