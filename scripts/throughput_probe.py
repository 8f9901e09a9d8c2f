#!/usr/bin/env python
"""Throughput probe against the reference's published numbers (BASELINE.md).

Generates N_ROWS of the reference's 90-column wide events schema into a local
zstd-6 warehouse table (the baseline's events_zstd_l06 analogue), then times
the baseline's query shapes on it:

- COUNT + varchar equality        (temp.md:42-44, 49.4M rows/s on 100M)
- COUNT + timestamp BETWEEN       (temp.md:81-82, 116M rows/s)
- COUNT + LIKE '%..%'             (temp.md:87-94, 30-40M rows/s)
- flagship LIKE+BETWEEN+int<      (temp.md:104-105, 40.7M rows/s)

plus load throughput (config/load.ts:22: 10M wide rows ~7 min via Trino).

Usage: python scripts/throughput_probe.py [n_rows] [workdir]
Writes a JSON line; PERF.md records results per round.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.pipeline.load import LoadPlan, load_table
from hands_on_iceberg_compression_spark.pipeline.metrology import measure_sizes
from hands_on_iceberg_compression_spark.schema.reference_schemas import wide_events_config
from hands_on_iceberg_compression_spark.session import make_session
from hands_on_iceberg_compression_spark.sources.warehouse import ParquetWarehouse


def _auto_driver_mem(n_rows: int) -> None:
    """Size the driver heap from the row count BEFORE the JVM starts
    (VERDICT r4 #7): the 100M probe died mid-optimize at the default 8g
    (JVM OOM -> py4j connection refused) and ran green at 24g.  An explicit
    SPARK_GRAFT_DRIVER_MEM always wins; otherwise scale ~0.25 KB/row with
    an 8g floor (100M -> 25g, within the 128 GiB box), so a clean shell
    needs no tribal knowledge."""
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        return
    import math

    gb = max(8, min(48, math.ceil(n_rows * 0.25e-6)))
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{gb}g"
    print(f"driver heap auto-sized to {gb}g for {n_rows} rows "
          "(override with SPARK_GRAFT_DRIVER_MEM)", file=sys.stderr)


def prune_probe(n_rows: int, workdir: str) -> None:
    """Quantify manifest pruning (VERDICT r4 #6): load a months(row_1)-
    partitioned LOG-MODE table (appends commit manifests with per-file
    partition values + column bounds), then time a bounded-range count
    through the full read vs ``read_pruned`` — the $files-metrology
    analogue of bench.ts:124-141.  Reports files kept/total and the
    wall-clock delta; prints one JSON line."""
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="prune-probe")
    cfg = wide_events_config()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    table = "events_log_part"
    wh.create_table(
        cfg.schema, table, "zstd", 6,
        properties={"snapshots": "true"}, partitioning=["months(row_1)"],
    )
    plan = LoadPlan(
        total_rows=n_rows,
        batch_rows=max(250_000, n_rows // 8),
        concurrency=4,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        compact_after_load=False,
        partitions_per_batch=32,
        progress=False,
    )
    t0 = time.perf_counter()
    load_table(spark, wh, cfg, table, plan)
    load_s = time.perf_counter() - t0

    head = wh.head_snapshot(cfg.schema, table)
    months = sorted({e["partitions"]["row_1_month"] for e in head["files"]})
    target = months[len(months) // 2]
    ranges = {"row_1_month": (target, target)}
    kept, total = wh.prune_files(cfg.schema, table, ranges)
    pred = F.col("row_1_month") == target

    def best_of(build):
        best, rows = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = build().filter(pred).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    t_full, rows_full = best_of(lambda: wh.read(cfg.schema, table))
    t_pruned, rows_pruned = best_of(
        lambda: wh.read_pruned(cfg.schema, table, ranges)
    )
    assert rows_full == rows_pruned, (rows_full, rows_pruned)
    print(json.dumps({
        "probe": "prune_files",
        "n_rows": n_rows,
        "partitioning": "months(row_1)",
        # a generation is data/<batch>/g_<uuid> — key on BOTH components
        # (ADVICE r5: batch-only counting undercounts replayed batches),
        # matching ParquetWarehouse._generation_root
        "generations": len({tuple(e["path"].split("/")[1:3]) for e in head["files"]}),
        "load_sec": round(load_s, 1),
        "target_month": target,
        "files_total": total,
        "files_kept": len(kept),
        "skip_pct": round(100 * (1 - len(kept) / total), 1),
        "rows_selected": rows_full,
        "full_read_sec": t_full,
        "pruned_read_sec": t_pruned,
        "speedup": round(t_full / t_pruned, 2) if t_pruned else None,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def mor_probe(n_rows: int, workdir: str) -> None:
    """Merge-on-read vs copy-on-write DELETE cost (VERDICT r7 #1's
    'Done' economics, measured): load a log-mode wide-events table, then

    1. time a 1-row COPY-ON-WRITE delete (``id = x``) and count the data
       bytes its rewrite produced;
    2. time a 1-row MERGE-ON-READ delete of a different row and record
       the delete-file bytes — the O(1-row)-vs-O(128 MB-file) headline;
    3. time the full-scan flagship count with the pending delete tuples
       (the read-side anti-join tax), then a ~1%-of-rows MoR delete, the
       read again, then ``optimize()`` (folds) and the read once more —
       the maintenance story: a maintained table pays only between ticks.

    Prints one JSON line."""
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="mor-probe")
    cfg = wide_events_config()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    table = "events_mor"
    wh.create_table(
        cfg.schema, table, "zstd", 6, properties={"snapshots": "true"}
    )
    plan = LoadPlan(
        total_rows=n_rows,
        batch_rows=max(250_000, n_rows // 8),
        concurrency=4,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        compact_after_load=False,
        partitions_per_batch=32,
        progress=False,
    )
    t0 = time.perf_counter()
    load_table(spark, wh, cfg, table, plan)
    load_s = time.perf_counter() - t0

    def head_bytes_by_path():
        return {
            e["path"]: e["bytes"]
            for e in wh.head_snapshot(cfg.schema, table)["files"]
        }

    def timed_read():
        best = float("inf")
        pred = (
            (F.col("row_16") < 80)
            & F.col("row_1").between(
                F.lit("2024-02-01 00:00:00").cast("timestamp"),
                F.lit("2024-10-01 00:00:00").cast("timestamp"),
            )
            & F.col("row_32").like("%50c%")
        )
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = wh.read(cfg.schema, table).filter(pred).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    out: dict = {"probe": "mor_delete", "n_rows": n_rows,
                 "load_sec": round(load_s, 1)}
    # baseline read BEFORE any delete: the honest denominator for the
    # read tax (after_fold also enjoys compaction, so tax_vs_folded
    # overstates the anti-join cost on a fragmented table)
    t_base, _rows0 = timed_read()

    before = head_bytes_by_path()
    t0 = time.perf_counter()
    cow = wh.delete_where(
        cfg.schema, table, f"id = {n_rows // 3}", mode="copy-on-write"
    )
    t_cow = time.perf_counter() - t0
    after = head_bytes_by_path()
    out["cow_1row"] = {
        "sec": round(t_cow, 3),
        "files_rewritten": cow["files_rewritten"],
        "data_bytes_rewritten": sum(
            b for p, b in after.items() if p not in before
        ),
    }
    t0 = time.perf_counter()
    mor = wh.delete_where(
        cfg.schema, table, f"id = {2 * n_rows // 3}", mode="merge-on-read"
    )
    t_mor = time.perf_counter() - t0
    out["mor_1row"] = {
        "sec": round(t_mor, 3),
        "delete_bytes": mor["delete_bytes"],
        "rows_deleted": mor["rows_deleted"],
    }
    # equality delete: 1000 keys, ZERO data IO (no scan finds positions)
    t0 = time.perf_counter()
    eq = wh.delete_by_keys(
        cfg.schema, table, list(range(1001, 2001)), eq_cols=["id"]
    )
    t_eq = time.perf_counter() - t0
    out["eq_1000keys"] = {
        "sec": round(t_eq, 3),
        "delete_bytes": eq["delete_bytes"],
        "targets": eq["targets"],
        "files_pruned": eq["files_pruned"],
    }
    t_tax1, rows1 = timed_read()
    # ~1% broad MoR delete: row_16 is uniform int — one point value
    t0 = time.perf_counter()
    broad = wh.delete_where(
        cfg.schema, table, "row_16 = 42", mode="merge-on-read"
    )
    t_broad = time.perf_counter() - t0
    out["mor_broad"] = {
        "sec": round(t_broad, 3),
        "rows_deleted": broad["rows_deleted"],
        "delete_bytes": broad["delete_bytes"],
        "pct_of_table": round(100 * broad["rows_deleted"] / n_rows, 2),
    }
    t_tax2, rows2 = timed_read()
    t0 = time.perf_counter()
    wh.optimize(cfg.schema, table)
    t_opt = time.perf_counter() - t0
    t_folded, rows3 = timed_read()
    assert rows2 == rows3, (rows2, rows3)
    out["flagship_read_sec"] = {
        "no_deletes": t_base,
        "pending_2_tuples": t_tax1,
        "pending_broad": t_tax2,
        "after_fold": t_folded,
        "tax_vs_baseline": round(t_tax2 / t_base, 2) if t_base else None,
        "tax_vs_folded": round(t_tax2 / t_folded, 2) if t_folded else None,
    }
    out["optimize_fold_sec"] = round(t_opt, 1)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def zorder_probe(n_rows: int, workdir: str) -> None:
    """Measure z-order clustering (r11, optimize(zorder=[...])): one
    table, three layouts over identical rows — unsorted compaction,
    single-column sort_order, 2-column Morton z-order — each pruned and
    timed on the same 2D box predicate (~1/8 of each dimension).  The
    z-curve's promise: per-file bounds tight on BOTH columns, so the
    box skips ~(1/8 x 1/8) of files where the linear sort skips only
    ~1/8.  Prints one JSON line."""
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="zorder-probe")

    def build(name, sort_order=None):
        wh = ParquetWarehouse(spark, os.path.join(workdir, name))
        wh.create_table(
            "lab", name, "zstd", 1,
            properties={"snapshots": "true"}, sort_order=sort_order,
        )
        df = spark.range(n_rows).select(
            F.col("id"),
            (F.xxhash64(F.col("id"), F.lit(1)) % 100_000).alias("x"),
            (F.xxhash64(F.col("id"), F.lit(2)) % 100_000).alias("y"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ).repartition(32)
        wh.append("lab", name, df, batch_id="base")
        head = wh.head_snapshot("lab", name)
        target = max(1, sum(e["bytes"] for e in head["files"]) // 64)
        return wh, target

    box = {"x": (-100_000, -75_000), "y": (25_000, 50_000)}  # 1/8 x 1/8
    cond = ("x >= -100000 AND x <= -75000 AND y >= 25000 AND y <= 50000")

    def best3(fn):
        return min(
            (lambda t0: (fn(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )

    out = {"probe": "zorder", "n_rows": n_rows, "layouts": {}}
    for name, sort_order, zorder in (
        ("plain", None, None),
        ("linear", ["x"], None),
        ("zord", None, ["x", "y"]),
    ):
        wh, target = build(name, sort_order)
        t0 = time.perf_counter()
        n_files = wh.optimize(
            "lab", name, target_file_size_bytes=target, zorder=zorder
        )
        opt_sec = time.perf_counter() - t0
        kept, total = wh.prune_files("lab", name, box)
        cnt = [None]
        read_sec = best3(lambda: cnt.__setitem__(
            0, wh.read_pruned("lab", name, box).where(cond).count()
        ))
        out["layouts"][name] = {
            "files": n_files,
            "optimize_sec": round(opt_sec, 2),
            "files_kept": len(kept),
            "files_total": total,
            "skip_pct": round(100 * (total - len(kept)) / max(1, total), 1),
            "box_count_sec": round(read_sec, 4),
            "box_rows": cnt[0],
        }
    counts = {v["box_rows"] for v in out["layouts"].values()}
    assert len(counts) == 1, counts  # identical rows, identical answer
    print(json.dumps(out))
    spark.stop()


def count_fastpath_probe(n_rows: int, workdir: str) -> None:
    """A/B for VERDICT r10 "what's wrong" #1 (measure-first): the
    monitoring count over a table with PENDING position deletes —
    join-plan ``read().count()`` vs manifest-arithmetic ``count_rows()``
    (per-target tuple counts recorded at delete-write time).  Shape
    mirrors the --mor-steady pending point: ``n_rows`` keyed rows, 3
    un-folded MoR delete batches of ~200k rows each.  Also measures the
    post-fold head-total path and documents the eq-delete NEGATIVE:
    pending equality deletes make the count unknowable from metadata
    (matched-row cardinality needs the read), so count_rows falls back
    there by design — the CDC steady state keeps paying the join plan.
    Prints one JSON line."""
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="count-fastpath-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    schema, table = "lab", "cnt_ab"
    wh.create_table(schema, table, "zstd", 1, properties={"snapshots": "true"})
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 997).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).repartition(32)
    t0 = time.perf_counter()
    wh.append(schema, table, df, batch_id="base")
    load_sec = time.perf_counter() - t0
    batch = max(1, n_rows // 200)  # ~0.5% per delete batch
    del_secs = []
    for i in range(3):
        lo = i * batch
        t0 = time.perf_counter()
        wh.delete_where(
            schema, table, f"id >= {lo} AND id < {lo + batch}",
            mode="merge-on-read",
        )
        del_secs.append(round(time.perf_counter() - t0, 3))
    pending = wh.delete_files_report(schema, table)

    def best3(fn):
        return min(_timed(fn) for _ in range(3))

    def _timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    expect = n_rows - 3 * batch
    got_join = [None]
    join_sec = best3(lambda: got_join.__setitem__(
        0, wh.read(schema, table).count()
    ))
    fast = [None]
    fast_sec = best3(lambda: fast.__setitem__(
        0, wh.count_rows(schema, table)
    ))
    assert got_join[0] == fast[0] == expect, (got_join, fast, expect)
    # negative side: one pending eq delete ON A LIVE KEY forces the
    # fallback (a key outside every file's bounds prunes to zero
    # targets and the fast path legitimately survives)
    wh.delete_by_keys(schema, table, [(n_rows - 1,)], ["id"])
    eq_fallback_sec = best3(lambda: wh.count_rows(schema, table))
    t0 = time.perf_counter()
    wh.optimize(schema, table)
    fold_sec = time.perf_counter() - t0
    folded_sec = best3(lambda: wh.count_rows(schema, table))
    print(json.dumps({
        "probe": "count_fastpath",
        "n_rows": n_rows,
        "load_sec": round(load_sec, 3),
        "mor_delete_batch_rows": batch,
        "mor_delete_secs": del_secs,
        "pending_delete_files": len(pending),
        "count_pending_join_sec": round(join_sec, 4),
        "count_pending_fastpath_sec": round(fast_sec, 4),
        "speedup": round(join_sec / max(fast_sec, 1e-9), 1),
        "count_pending_eq_fallback_sec": round(eq_fallback_sec, 4),
        "fold_sec": round(fold_sec, 3),
        "count_folded_sec": round(folded_sec, 4),
    }))
    spark.stop()


def merge_into_probe(n_rows: int, workdir: str) -> None:
    """Conditional-MERGE tick economics at scale (r12): a keyed snapshot
    table of ``n_rows`` keys, then 8 CDC epochs of 20k rows applied two
    ways — plain ``merge_upsert(mode='merge-on-read')`` (O(batch): no
    target read) vs ``merge_into`` with a freshness guard + tombstone
    clause (adds ONE key-join discovery pass over the delete-applied
    target — the inherent price of conditional clauses, same as
    Iceberg/Delta MERGE touched-row discovery).  Measures per-epoch p50
    for both, so PERF.md records what a conditional clause actually
    costs at the CDC steady state.  Prints one JSON line."""
    import statistics

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="merge-into-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table("lab", "plain", "zstd", 1, properties={"snapshots": "true"})
    wh.create_table("lab", "cond", "zstd", 1, properties={"snapshots": "true"})

    def base(n):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                F.lit(0).cast("int").alias("ts"),
                F.col("id").alias("eid"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartition(32)
        )

    for t in ("plain", "cond"):
        wh.append("lab", t, base(n_rows), batch_id="seed")
        wh.optimize("lab", t, target_file_size_bytes=128 * 1024 * 1024)

    batch_n = 20_000
    plain_s, cond_s = [], []
    for epoch in range(8):
        upd = (
            spark.range(batch_n)
            .select(
                ((F.col("id") * 7919 + epoch) % n_rows).alias("k"),
                F.lit(epoch + 1).cast("int").alias("ts"),
                (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                F.sha2((F.col("id") + epoch).cast("string"), 256).alias(
                    "payload"
                ),
                (F.col("id") % 20 == 0).alias("dead"),
            )
            .dropDuplicates(["k"])
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        wh.merge_upsert(
            "lab", "plain", upd, ["k"], delete_col="dead",
            mode="merge-on-read",
        )
        plain_s.append(time.perf_counter() - t0)
        src = upd.withColumn(
            "op", F.when(F.col("dead"), F.lit("D")).otherwise(F.lit("U"))
        ).drop("dead")
        t0 = time.perf_counter()
        wh.merge_into(
            "lab", "cond", src, ["k"],
            matched_condition="s.ts > t.ts",
            matched_delete="s.op = 'D'",
            mode="merge-on-read",
        )
        cond_s.append(time.perf_counter() - t0)
        if epoch % 4 == 3:
            # the mor-steady maintenance cadence: fold the stacked CDC
            # delete batches so the conditional tick's discovery read
            # measures the steady state, not unbounded delete stacking
            for t in ("plain", "cond"):
                wh.optimize("lab", t, target_file_size_bytes=128 * 1024 * 1024)
    out = {
        "probe": "merge_into",
        "base_keys": n_rows,
        "batch_rows": batch_n,
        "epochs": 8,
        "plain_upsert_p50_sec": round(statistics.median(plain_s), 3),
        "plain_upsert_max_sec": round(max(plain_s), 3),
        "merge_into_p50_sec": round(statistics.median(cond_s), 3),
        "merge_into_max_sec": round(max(cond_s), 3),
        "conditional_tax": round(
            statistics.median(cond_s) / statistics.median(plain_s), 2
        ),
        "plain_epochs_sec": [round(x, 3) for x in plain_s],
        "merge_into_epochs_sec": [round(x, 3) for x in cond_s],
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def bloom_probe(n_rows: int, workdir: str) -> None:
    """Per-file key-bloom membership pruning A/B (VERDICT r12 #1) on
    UNIFORM keys — the case r12 MEASURED min/max envelopes buying zero
    (every file's bounds span the whole keyspace).  Base table holds
    ``n_rows`` EVEN keys (k = 2*id, round-robin partitioned so per-file
    envelopes all overlap), compacted, twice: ``bloom_columns=k`` on vs
    off.  Reports:

    - prune_files with B present keys (B = 16 / 128 / 1024, spread):
      files kept on vs off + planning ms — the planning-time skipping
      merge_into discovery / delete_by_keys / read_where inherit;
    - prune_files with 1024 ABSENT odd keys (inside every file's
      bounds): surviving files are pure false positives -> empirical
      per-probe FPR back-out;
    - merge_into tick (freshness + tombstone clauses) p50 over 4 epochs
      at B=1024, on vs off — the discovery-scan pruning for uniform
      keys the r12 envelope could not touch;
    - delete_by_keys files_pruned at B=1024, on vs off.

    Batches past MERGE_DISCRETE_KEYS_MAX (2048) keep the envelope path
    BY DESIGN: at 20k uniform keys over ~32 files every file genuinely
    contains batch keys and file-level membership cannot discriminate —
    an information-theoretic limit, recorded in PERF.md, not a knob.
    Prints one JSON line."""
    import statistics

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="bloom-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))

    def seed(table: str, props: dict) -> None:
        wh.create_table("lab", table, "zstd", 1, properties=props)
        wh.append(
            "lab", table,
            spark.range(n_rows)
            .select(
                (F.col("id") * 2).alias("k"),
                F.lit(0).cast("int").alias("ts"),
                F.col("id").alias("eid"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartition(32),
            batch_id="seed",
        )
        # ~8 MB files -> a few dozen base files at 4M rows: membership
        # pruning is a B-vs-F game (P(file clean) = e^(-B/F) for uniform
        # keys) and a 2-file table has nothing to prune at ANY batch size
        wh.optimize("lab", table, target_file_size_bytes=8 * 1024 * 1024)

    # session warmup seed, not measured: the FIRST table of a session
    # pays JIT/python-worker/page-cache warmup larger than the effect
    # under test (the r13 order-bias lesson, which the merge ticks below
    # already alternate for — seeding needs the same discipline; before
    # this, bl_on seeded first and the A/B charged session warmup to the
    # bloom write path)
    seed("bl_warm", {"snapshots": "true"})
    t0 = time.perf_counter()
    seed("bl_on", {"snapshots": "true", "bloom_columns": "k"})
    seed_on_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    seed("bl_off", {"snapshots": "true"})
    seed_off_s = time.perf_counter() - t0

    def spread_keys(b: int, even: bool, salt: int = 0) -> list[int]:
        ks = [((i * 7919 + salt) % n_rows) * 2 for i in range(b)]
        return sorted({k if even else k + 1 for k in ks})

    out: dict = {
        "probe": "bloom",
        "base_keys": n_rows,
        "seed_on_sec": round(seed_on_s, 3),
        "seed_off_sec": round(seed_off_s, 3),
        "prune": {},
    }
    for b in (8, 64, 512, 1024):
        keys = spread_keys(b, even=True)
        row = {}
        for table in ("bl_on", "bl_off"):
            wh._bloom_cache.clear()
            t0 = time.perf_counter()
            kept, total = wh.prune_files("lab", table, {"k": keys})
            cold_ms = (time.perf_counter() - t0) * 1000
            t0 = time.perf_counter()
            wh.prune_files("lab", table, {"k": keys})
            warm_ms = (time.perf_counter() - t0) * 1000
            row[table] = {
                "kept": len(kept),
                "total": total,
                "plan_cold_ms": round(cold_ms, 1),
                "plan_warm_ms": round(warm_ms, 1),
            }
        out["prune"][f"present_{b}"] = row
    # absent keys INSIDE every file's bounds: survivors = pure FPs
    absent = spread_keys(1024, even=False)
    kept, total = wh.prune_files("lab", "bl_on", {"k": absent})
    fp_file_rate = len(kept) / total
    # per-probe fpr from P(file survives) = 1 - (1 - fpr)^B
    import math

    fpr = 1.0 - (1.0 - fp_file_rate) ** (1.0 / len(absent))
    out["prune"]["absent_1024"] = {
        "kept": len(kept),
        "total": total,
        "empirical_fpr_per_probe": round(fpr, 8),
    }

    # merge_into tick A/B at B=64 — inside the win regime (B <= F);
    # larger batches genuinely touch every base file and membership
    # cannot discriminate (the information-theoretic limit)
    ticks: dict[str, list[float]] = {"bl_on": [], "bl_off": []}
    for epoch in range(8):
        keys = spread_keys(64, even=True, salt=epoch + 1)
        src = (
            spark.createDataFrame(
                [(k, epoch + 1, "D" if k % 40 == 0 else "U") for k in keys],
                "k bigint, ts int, op string",
            )
            .withColumn("eid", F.col("k"))
            .withColumn("payload", F.sha2(F.col("k").cast("string"), 256))
            .localCheckpoint(eager=True)
        )
        # ALTERNATE the A/B order per epoch: whichever table runs first
        # pays the epoch's warmup (JIT/page-cache) — measured at ~1-2 s,
        # larger than the effect under test; alternating cancels it in
        # the p50 (instrumented A/B in PERF.md r13)
        order = (
            ("bl_on", "bl_off") if epoch % 2 else ("bl_off", "bl_on")
        )
        for table in order:
            t0 = time.perf_counter()
            wh.merge_into(
                "lab", table, src, ["k"],
                matched_condition="s.ts > t.ts",
                matched_delete="s.op = 'D'",
                mode="merge-on-read",
            )
            ticks[table].append(time.perf_counter() - t0)
    out["merge_into_64"] = {
        t: {
            "p50_sec": round(statistics.median(v), 3),
            "epochs_sec": [round(x, 3) for x in v],
        }
        for t, v in ticks.items()
    }
    out["merge_into_speedup"] = round(
        statistics.median(ticks["bl_off"]) / statistics.median(ticks["bl_on"]),
        2,
    )

    # delete_by_keys target narrowing A/B (fresh spread keys)
    dk = {}
    for table in ("bl_on", "bl_off"):
        keys = spread_keys(1024, even=True, salt=99)
        t0 = time.perf_counter()
        res = wh.delete_by_keys("lab", table, keys, eq_cols=["k"])
        dk[table] = {
            "files_pruned": res["files_pruned"],
            "targets": res["targets"],
            "sec": round(time.perf_counter() - t0, 3),
        }
    out["delete_by_keys_1024_cdc_stacked"] = dk
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def mv_bloom_probe(n_rows: int, workdir: str) -> None:
    """Keep-latest MV tick A/B with BLOOM-PRUNED source refresh
    (VERDICT r13 #6): the maintainer's touched-keys refresh read now
    routes through read_pruned for windows <= 1024 keys, so a
    bloom-enabled source skips files at exactly the B <= file-count
    regime where membership discriminates.  Source: ``n_rows`` uniform
    bigint keys (bloom_columns=k), compacted to ~8 MB files; per B in
    (8, 64): 8 epochs of one B-row append + one tick into TWO
    independent MVs — prune_source on vs off — ALTERNATING order per
    epoch (the r13 order-bias lesson).  Both MVs must equal the
    keep-latest recompute at the end.  Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.operators.dedup import (
        keep_latest,
    )
    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_keep_latest_mv,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="mv-bloom-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table(
        "lab", "src", "zstd", 1,
        properties={"snapshots": "true", "bloom_columns": "k"},
    )
    wh.append(
        "lab", "src",
        spark.range(n_rows)
        .select(
            (F.col("id") * 2).alias("k"),
            F.lit(0).cast("int").alias("ts"),
            F.col("id").alias("event_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=8 * 1024 * 1024)
    cks = {}
    for name in ("mv_p", "mv_f"):
        wh.create_table(
            "lab", name, "zstd", 1, properties={"snapshots": "true"}
        )
        cks[name] = os.path.join(workdir, f"ck_{name}.json")

    def tick(name: str) -> float:
        t0 = time.perf_counter()
        maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", name), ["k"],
            ts_col="ts", tie_col="event_id",
            checkpoint_file=cks[name], prune_source=(name == "mv_p"),
        )
        return time.perf_counter() - t0

    boot = {name: round(tick(name), 3) for name in ("mv_p", "mv_f")}
    out = {
        "probe": "mv_bloom",
        "base_keys": n_rows,
        "bootstrap_sec": boot,
        "ticks": {},
    }
    salt = 0
    for b in (8, 64):
        ticks: dict[str, list[float]] = {"mv_p": [], "mv_f": []}
        for epoch in range(8):
            salt += 1
            ks = sorted({((i * 7919 + salt) % n_rows) * 2 for i in range(b)})
            wh.append(
                "lab", "src",
                spark.createDataFrame([(k,) for k in ks], "k bigint")
                .select(
                    "k",
                    F.lit(salt).cast("int").alias("ts"),
                    (F.col("k") + salt * 10 * n_rows).alias("event_id"),
                    F.sha2((F.col("k") + salt).cast("string"), 256).alias(
                        "payload"
                    ),
                )
                .coalesce(1),
                batch_id=f"e{salt}",
            )
            order = (
                ("mv_p", "mv_f") if epoch % 2 else ("mv_f", "mv_p")
            )
            for name in order:
                ticks[name].append(tick(name))
        out["ticks"][f"B{b}"] = {
            name: {
                "p50_sec": round(statistics.median(v), 3),
                "epochs_sec": [round(x, 3) for x in v],
            }
            for name, v in ticks.items()
        }
        out["ticks"][f"B{b}"]["speedup"] = round(
            statistics.median(ticks["mv_f"])
            / statistics.median(ticks["mv_p"]),
            3,
        )
    # convergence: both MVs must equal the keep-latest recompute exactly
    want = keep_latest(wh.read("lab", "src"), ["k"], "ts", "event_id")
    for name in ("mv_p", "mv_f"):
        got = wh.read("lab", name)
        out[f"{name}_diff_rows"] = int(
            want.exceptAll(got).count() + got.exceptAll(want).count()
        )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def merge_batched_probe(n_rows: int, workdir: str) -> None:
    """Batched changelog->MERGE application curve (VERDICT r12 #4 /
    r13 #3): merge_into pays a fixed per-call discovery tax (~5.3x a
    plain read for 20k ticks, three host-days) — ``merge_into_batched``
    accumulates source CDC commits and fires once per ``max_lag_commits``
    window.  Per window size W in (1, 2, 4, 8): fresh 4M source+mirror
    pair, 8 epochs of one 20k-row MoR CDC upsert (2.5% deletes) each,
    one poll per epoch.  Reports per-W total apply time, per-epoch
    amortized cost, p50 fire cost, and the mirror-equality check (the
    at-least-once batching must not change WHAT lands).  A warmup pair
    runs first (the r13 order-bias lesson).  Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.pipeline.cdc_apply import (
        merge_into_batched,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="merge-batched-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    EPOCHS = 8

    def seed_pair(tag: str) -> tuple[str, str]:
        src, tgt = f"s_{tag}", f"t_{tag}"
        base = (
            spark.range(n_rows)
            .select(
                (F.col("id") * 2).alias("k"),
                F.lit(0).cast("int").alias("ts"),
                F.col("id").alias("event_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        for t in (src, tgt):
            wh.create_table(
                "lab", t, "zstd", 1, properties={"snapshots": "true"}
            )
            wh.append("lab", t, base, batch_id="seed")
            wh.optimize("lab", t, target_file_size_bytes=32 * 1024 * 1024)
        base.unpersist()
        return src, tgt

    def batch(epoch: int, salt: int):
        ks = sorted({((i * 7919 + salt) % n_rows) * 2 for i in range(20_000)})
        return (
            spark.createDataFrame([(k,) for k in ks], "k bigint")
            .select(
                "k",
                F.lit(epoch).cast("int").alias("ts"),
                (F.col("k") + epoch * 10 * n_rows).alias("event_id"),
                F.sha2((F.col("k") + epoch).cast("string"), 256).alias(
                    "payload"
                ),
                (F.col("k") % 80 == 0).alias("del"),
            )
            .localCheckpoint(eager=True)
        )

    def run_pair(tag: str, w: int, epochs: int) -> dict:
        src, tgt = seed_pair(tag)
        ck = os.path.join(workdir, f"ck_{tag}.json")
        merge_into_batched(wh, ("lab", src), ("lab", tgt), ["k"], ck)
        polls: list[float] = []
        fires: list[float] = []
        for epoch in range(1, epochs + 1):
            wh.merge_upsert(
                "lab", src, batch(epoch, epoch * 13 + w), ["k"],
                delete_col="del", mode="merge-on-read",
            )
            t0 = time.perf_counter()
            r = merge_into_batched(
                wh, ("lab", src), ("lab", tgt), ["k"], ck,
                max_lag_commits=w,
            )
            dt = time.perf_counter() - t0
            polls.append(dt)
            if r["fired"]:
                fires.append(dt)
        # drain any tail lag, then the mirror must equal the source
        merge_into_batched(
            wh, ("lab", src), ("lab", tgt), ["k"], ck, max_lag_commits=1
        )
        s_df, t_df = wh.read("lab", src), wh.read("lab", tgt)
        diff = int(
            s_df.exceptAll(t_df).count() + t_df.exceptAll(s_df).count()
        )
        return {
            "fires": len(fires),
            "apply_total_sec": round(sum(polls), 3),
            "per_epoch_sec": round(sum(polls) / epochs, 3),
            "fire_p50_sec": (
                round(statistics.median(fires), 3) if fires else None
            ),
            "mirror_diff_rows": diff,
        }

    run_pair("warm", 1, 2)  # session warmup, not reported
    out = {
        "probe": "merge_batched",
        "base_rows": n_rows,
        "epochs": EPOCHS,
        "windows": {},
    }
    for w in (1, 2, 4, 8):
        out["windows"][str(w)] = run_pair(f"w{w}", w, EPOCHS)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def agg_mv_probe(n_rows: int, workdir: str) -> None:
    """Self-maintainable aggregate-MV tick economics (VERDICT r12 #3):
    a count/sum/avg-per-group view maintained purely from changelog
    deltas — NO source re-read per tick (the keep-latest maintainer's
    per-tick touched-keys semi-join over the source is the cost this
    removes for the aggregate case).  Source: ``n_rows`` rows across
    ~200 groups; per epoch one 20k-row append lands and one maintenance
    tick runs.  Reports bootstrap cost, tick p50/max, and the
    batch-recompute cost the tick replaces.  Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_agg_mv,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="agg-mv-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    wh.create_table("lab", "mv", "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "src",
        spark.range(n_rows).select(
            (F.col("id") % 200).cast("int").alias("grp"),
            F.col("id").alias("eid"),
            (F.col("id") % 1000).cast("int").alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ).repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    ckpt = os.path.join(workdir, "ck.json")
    # default: the maintainer's shipped mode="auto" (r15 — resolves to
    # CoW for this probe's small MV); --cow / --mor-mv force a mode for
    # A/B (the r15 decomposition measured CoW at recompute parity where
    # MoR paid a growing delete-stack read)
    mode = (
        "copy-on-write"
        if "--cow" in sys.argv
        else ("merge-on-read" if "--mor-mv" in sys.argv else "auto")
    )

    def tick():
        return maintain_agg_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], sum_cols=["v"],
            checkpoint_file=ckpt, mode=mode,
        )

    t0 = time.perf_counter()
    tick()  # bootstrap: full recompute at the checkpointed version
    bootstrap_s = time.perf_counter() - t0
    # the zero-source-re-read claim, made assertable (VERDICT r13 #1):
    # count full-table source reads during steady-state ticks — the agg
    # maintainer must do NONE (only the changelog window is read); the
    # keep-latest maintainer pays exactly one per tick (its touched-keys
    # semi-join reads the source's current state)
    src_full_reads = [0]
    real_read, real_snap = wh.read, wh.read_snapshot

    def counting_read(schema, table, *a, **k):
        if (schema, table) == ("lab", "src"):
            src_full_reads[0] += 1
        return real_read(schema, table, *a, **k)

    def counting_snap(schema, table, *a, **k):
        if (schema, table) == ("lab", "src"):
            src_full_reads[0] += 1
        return real_snap(schema, table, *a, **k)

    wh.read, wh.read_snapshot = counting_read, counting_snap
    ticks = []
    for epoch in range(10):
        wh.append(
            "lab", "src",
            spark.range(20_000).select(
                ((F.col("id") + epoch) % 200).cast("int").alias("grp"),
                (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                (F.col("id") % 777).cast("int").alias("v"),
                F.sha2((F.col("id") + epoch).cast("string"), 256).alias(
                    "payload"
                ),
            ),
            batch_id=f"b{epoch}",
        )
        t0 = time.perf_counter()
        out = tick()
        ticks.append(time.perf_counter() - t0)
        assert out["groups_refreshed"] == 200
    wh.read, wh.read_snapshot = real_read, real_snap
    assert src_full_reads[0] == 0, src_full_reads
    # the cost a tick replaces: one full groupBy recompute of the source
    t0 = time.perf_counter()
    full = (
        wh.read("lab", "src")
        .groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_v"))
    )
    n_groups = full.count()
    full_s = time.perf_counter() - t0
    mv_total = wh.read("lab", "mv").agg(F.sum("cnt")).collect()[0][0]
    out = {
        "probe": "agg_mv",
        "mv_mode": mode,
        "source_rows": n_rows + 10 * 20_000,
        "groups": n_groups,
        "bootstrap_sec": round(bootstrap_s, 3),
        "tick_p50_sec": round(statistics.median(ticks), 3),
        "tick_max_sec": round(max(ticks), 3),
        "ticks_sec": [round(x, 3) for x in ticks],
        "full_recompute_sec": round(full_s, 3),
        "src_full_reads_during_ticks": src_full_reads[0],
        "mv_rows_covered": int(mv_total),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def agg_mv_crossover_probe(workdir: str) -> None:
    """CoW-vs-MoR tick cost as a function of MV SIZE (VERDICT r15 #2):
    the mode="auto" threshold ``_AGG_MV_COW_MAX_ROWS`` encodes "small
    MVs should rewrite, large MVs should delta-commit" but the
    crossover row count was never measured.  For each MV size (group
    count) one source is seeded with exactly one row per group, TWO MVs
    are maintained side by side from the SAME appends — one forced
    copy-on-write, one forced merge-on-read — and per epoch a 20k-row
    append lands and both tick (alternating which goes first, so
    neither charges the other's page-cache warmup — the r14 bloom-probe
    lesson).  Reports per-size tick p50 and the p50 of the LAST three
    ticks (MoR stacks delete entries, so its late ticks are the honest
    steady state).  Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_agg_mv,
    )

    batch_rows = 20_000
    sizes = [50_000, 250_000, 1_000_000, 4_000_000]
    for a in sys.argv:
        if a.startswith("--batch-rows="):
            # r17 (VERDICT r16 #5): batch-size sensitivity — a bigger
            # CDC batch rewrites proportionally more per CoW tick and
            # crosses earlier
            batch_rows = int(a.split("=", 1)[1])
        if a.startswith("--sizes="):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="agg-mv-crossover-probe")
    epochs = 6
    out = {
        "probe": "agg_mv_crossover", "epochs": epochs,
        "batch_rows": batch_rows, "points": [],
    }
    for g in sizes:
        wh = ParquetWarehouse(spark, os.path.join(workdir, f"wh_{g}"))
        wh.create_table(
            "lab", "src", "zstd", 1, properties={"snapshots": "true"}
        )
        for m in ("cow", "mor"):
            wh.create_table(
                "lab", f"mv_{m}", "zstd", 1,
                properties={"snapshots": "true"},
            )
        wh.append(
            "lab", "src",
            spark.range(g).select(
                F.col("id").alias("grp"),
                F.col("id").alias("eid"),
                (F.col("id") % 1000).cast("int").alias("v"),
            ).repartition(32),
            batch_id="seed",
        )
        wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
        cks = {
            m: os.path.join(workdir, f"ck_{g}_{m}.json")
            for m in ("cow", "mor")
        }
        modes = {"cow": "copy-on-write", "mor": "merge-on-read"}

        def tick(m):
            return maintain_agg_mv(
                wh, ("lab", "src"), ("lab", f"mv_{m}"), ["grp"],
                sum_cols=["v"], checkpoint_file=cks[m], mode=modes[m],
            )

        for m in ("cow", "mor"):
            tick(m)  # bootstrap (full recompute, not timed as a tick)
        ticks = {"cow": [], "mor": []}
        for epoch in range(epochs):
            wh.append(
                "lab", "src",
                spark.range(batch_rows).select(
                    ((F.col("id") * 6151 + epoch) % g).alias("grp"),
                    (F.col("id") + (epoch + 1) * g).alias("eid"),
                    (F.col("id") % 777).cast("int").alias("v"),
                ),
                batch_id=f"b{epoch}",
            )
            order = ("cow", "mor") if epoch % 2 == 0 else ("mor", "cow")
            for m in order:
                t0 = time.perf_counter()
                r = tick(m)
                ticks[m].append(time.perf_counter() - t0)
                assert r["groups_refreshed"] > 0
        # convergence cross-check: both MVs carry identical totals
        tot = {
            m: wh.read("lab", f"mv_{m}")
            .agg(F.sum("cnt"), F.sum("sum_v")).collect()[0]
            for m in ("cow", "mor")
        }
        assert tuple(tot["cow"]) == tuple(tot["mor"]), tot
        out["points"].append({
            "mv_rows": g,
            "cow_p50": round(statistics.median(ticks["cow"]), 3),
            "mor_p50": round(statistics.median(ticks["mor"]), 3),
            "cow_last3_p50": round(
                statistics.median(ticks["cow"][-3:]), 3
            ),
            "mor_last3_p50": round(
                statistics.median(ticks["mor"][-3:]), 3
            ),
            "cow_ticks": [round(x, 3) for x in ticks["cow"]],
            "mor_ticks": [round(x, 3) for x in ticks["mor"]],
        })
        shutil.rmtree(os.path.join(workdir, f"wh_{g}"), ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def tick_jobs_probe(n_rows: int, workdir: str) -> None:
    """Decompose maintainer ticks into their SPARK JOBS (VERDICT r14 #1:
    the ~2.5-2.9 s steady-state tick floor is ~8-10 fixed jobs, not
    data volume — attack it by folding jobs).  Runs keep-latest and agg
    MV ticks under a job group per tick and reports, per tick, the job
    count plus each job's action callsite (result-stage name), so the
    before/after of a fold is visible job by job.  Job counts are scale-
    independent; run small (default 500k) for fast iteration and read
    wall-clock p50 from --mv-steady/--agg-mv at 4M."""
    import statistics

    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_agg_mv,
        maintain_keep_latest_mv,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="tick-jobs-probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def job_sites(group: str) -> list[str]:
        sites = []
        for jid in sorted(tracker.getJobIdsForGroup(group)):
            info = tracker.getJobInfo(jid)
            name = "?"
            if info is not None and info.stageIds:
                st = tracker.getStageInfo(max(info.stageIds))
                if st is not None:
                    name = st.name.split(os.sep)[-1]
            sites.append(name)
        return sites

    out = {"probe": "tick_jobs", "source_rows": n_rows}
    for kind in ("keep_latest", "agg"):
        wh = ParquetWarehouse(spark, os.path.join(workdir, f"wh_{kind}"))
        for t in ("src", "mv"):
            wh.create_table(
                "lab", t, "zstd", 1, properties={"snapshots": "true"}
            )
        wh.append(
            "lab", "src",
            spark.range(n_rows).select(
                (F.col("id") % max(n_rows // 20, 200)).alias("k"),
                (F.col("id") % 200).cast("int").alias("grp"),
                F.lit(0).cast("int").alias("ts"),
                F.col("id").alias("eid"),
                (F.col("id") % 1000).cast("int").alias("v"),
            ).repartition(8),
            batch_id="seed",
        )
        ckpt = os.path.join(workdir, f"ck_{kind}.json")

        def tick():
            if kind == "keep_latest":
                return maintain_keep_latest_mv(
                    wh, ("lab", "src"), ("lab", "mv"), ["k"],
                    ts_col="ts", tie_col="eid", checkpoint_file=ckpt,
                )
            return maintain_agg_mv(
                wh, ("lab", "src"), ("lab", "mv"), ["grp"],
                sum_cols=["v"], checkpoint_file=ckpt,
            )

        tick()  # bootstrap (not decomposed)
        counts, times, last_sites = [], [], []
        for epoch in range(6):
            wh.append(
                "lab", "src",
                spark.range(2_000).select(
                    ((F.col("id") * 31 + epoch) % max(n_rows // 20, 200))
                    .alias("k"),
                    ((F.col("id") + epoch) % 200).cast("int").alias("grp"),
                    F.lit(epoch + 1).cast("int").alias("ts"),
                    (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                    (F.col("id") % 777).cast("int").alias("v"),
                ).coalesce(1),
                batch_id=f"e{epoch}",
            )
            group = f"{kind}_tick{epoch}"
            sc.setJobGroup(group, f"{kind} maintainer tick {epoch}")
            t0 = time.perf_counter()
            tick()
            times.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            last_sites = job_sites(group)
            counts.append(len(last_sites))
        out[kind] = {
            "jobs_per_tick": counts,
            "jobs_p50": statistics.median(counts),
            "tick_p50_sec": round(statistics.median(times), 3),
            "last_tick_jobs": last_sites,
        }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def join_mv_probe(n_rows: int, workdir: str) -> None:
    """Incremental join-MV tick economics (r15): a keep_latest(L) JOIN
    keep_latest(R) view over an ``n_rows``-key left and n_rows/4-key
    right, 10 epochs of one 20k-row CDC batch landing on ALTERNATING
    sides + one ``maintain_join_mv`` tick.  Reports tick p50/max and
    the full batch-join recompute the tick replaces.  ``--left`` runs
    the LEFT OUTER enrichment shape (r16) — same cadence, the join and
    the recompute both switch shape.  Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.operators.dedup import keep_latest
    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_join_mv,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="join-mv-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    for t in ("l", "r", "mv"):
        wh.create_table("lab", t, "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "l",
        spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("int").alias("ts"),
            F.col("id").alias("eid"),
            F.sha2(F.col("id").cast("string"), 256).alias("lv"),
        ).repartition(32),
        batch_id="seed_l",
    )
    wh.append(
        "lab", "r",
        spark.range(n_rows // 4).select(
            (F.col("id") * 4).alias("k"),
            F.lit(0).cast("int").alias("ts"),
            F.col("id").alias("eid"),
            (F.col("id") % 997).cast("int").alias("rv"),
        ).repartition(8),
        batch_id="seed_r",
    )
    for t in ("l", "r"):
        wh.optimize("lab", t, target_file_size_bytes=128 * 1024 * 1024)
    ckl = os.path.join(workdir, "ckl.json")
    ckr = os.path.join(workdir, "ckr.json")
    how = "left" if "--left" in sys.argv else "inner"

    def tick():
        return maintain_join_mv(
            wh, ("lab", "l"), ("lab", "r"), ("lab", "mv"), ["k"],
            ts_col="ts", tie_col="eid",
            checkpoint_left=ckl, checkpoint_right=ckr, how=how,
        )

    t0 = time.perf_counter()
    out0 = tick()
    bootstrap_s = time.perf_counter() - t0
    assert out0["keys_refreshed"] == -1
    ticks = []
    for epoch in range(10):
        side, width = (("l", n_rows) if epoch % 2 == 0 else ("r", n_rows // 4))
        batch = spark.range(20_000).select(
            (((F.col("id") * 6151 + epoch) % width)
             * (1 if side == "l" else 4)).alias("k"),
            F.lit(epoch + 1).cast("int").alias("ts"),
            (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
            (
                F.sha2((F.col("id") + epoch).cast("string"), 256).alias("lv")
                if side == "l"
                else (F.col("id") % 991).cast("int").alias("rv")
            ),
        )
        wh.merge_upsert("lab", side, batch, ["k"], mode="merge-on-read")
        t0 = time.perf_counter()
        r = tick()
        ticks.append(time.perf_counter() - t0)
        assert r["keys_refreshed"] > 0
        if epoch % 4 == 3:
            for t in ("l", "r", "mv"):
                wh.optimize(
                    "lab", t, target_file_size_bytes=128 * 1024 * 1024
                )
    # the cost a tick replaces: one full batch-join recompute + rewrite
    t0 = time.perf_counter()
    lj = keep_latest(wh.read("lab", "l"), ["k"], "ts", "eid").select("k", "lv")
    rj = keep_latest(wh.read("lab", "r"), ["k"], "ts", "eid").select("k", "rv")
    lj.join(rj, ["k"], how).write.mode("overwrite").parquet(
        os.path.join(workdir, "full_recompute")
    )
    full_s = time.perf_counter() - t0
    # convergence cross-check at scale
    mv_n = wh.read("lab", "mv").count()
    exp_n = lj.join(rj, ["k"], how).count()
    assert mv_n == exp_n, (mv_n, exp_n)
    print(json.dumps({
        "probe": "join_mv",
        "how": how,
        "left_keys": n_rows,
        "right_keys": n_rows // 4,
        "batch_rows": 20_000,
        "epochs": 10,
        "bootstrap_sec": round(bootstrap_s, 3),
        "tick_p50_sec": round(statistics.median(ticks), 3),
        "tick_max_sec": round(max(ticks), 3),
        "ticks_sec": [round(x, 3) for x in ticks],
        "full_recompute_sec": round(full_s, 3),
        "mv_rows": mv_n,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def topn_mv_probe(n_rows: int, workdir: str) -> None:
    """Incremental top-N-per-group MV tick economics (r16): an
    ``n_rows``-doc corpus across n_rows/100 groups, top-3-by-score per
    group; 10 epochs of one batch append + one ``maintain_topn_mv``
    tick vs the full window-recompute the tick replaces.  Batch size
    defaults to 20k rows (touches ~20k groups — past the pruning cap,
    the scan-dominated regime); ``--batch-rows=N`` sets it (512 = the
    small-window CDC norm, which routes through read_pruned).  Prints
    one JSON line."""
    import statistics

    from pyspark.sql.window import Window

    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_topn_mv,
    )

    batch_rows = 20_000
    mv_mode = "merge-on-read"
    for a in sys.argv:
        if a.startswith("--batch-rows="):
            batch_rows = int(a.split("=", 1)[1])
        if a.startswith("--mv-mode="):
            mv_mode = a.split("=", 1)[1]
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="topn-mv-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    wh.create_table("lab", "mv", "zstd", 1, properties={"snapshots": "true"})
    n_groups = n_rows // 100
    wh.append(
        "lab", "src",
        spark.range(n_rows).select(
            (F.col("id") % n_groups).alias("grp"),
            F.col("id").alias("doc_id"),
            ((F.col("id") * 2654435761) % 1000000).alias("score"),
            F.sha2(F.col("id").cast("string"), 256).alias("body"),
        ).repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    ckpt = os.path.join(workdir, "ck.json")

    def tick():
        return maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], 3,
            order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
            mode=mv_mode,
        )

    t0 = time.perf_counter()
    out0 = tick()
    bootstrap_s = time.perf_counter() - t0
    assert out0["groups_refreshed"] == -1
    ticks = []
    for epoch in range(10):
        wh.append(
            "lab", "src",
            spark.range(batch_rows).select(
                (((F.col("id") * 6151 + epoch) % n_groups)).alias("grp"),
                (F.col("id") + (epoch + 1) * n_rows).alias("doc_id"),
                ((F.col("id") * 48271 + epoch) % 1000000).alias("score"),
                F.sha2((F.col("id") + epoch).cast("string"), 256).alias(
                    "body"
                ),
            ),
            batch_id=f"b{epoch}",
        )
        t0 = time.perf_counter()
        r = tick()
        ticks.append(time.perf_counter() - t0)
        assert r["groups_refreshed"] > 0
        if epoch % 4 == 3:
            for t in ("src", "mv"):
                wh.optimize(
                    "lab", t, target_file_size_bytes=128 * 1024 * 1024
                )
    # the cost a tick replaces: the full window recompute + rewrite
    t0 = time.perf_counter()
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").desc_nulls_last()
    )
    full = (
        wh.read("lab", "src")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    full.write.mode("overwrite").parquet(os.path.join(workdir, "full"))
    full_s = time.perf_counter() - t0
    mv_n = wh.read("lab", "mv").count()
    exp_n = full.count()
    assert mv_n == exp_n, (mv_n, exp_n)
    print(json.dumps({
        "probe": "topn_mv",
        "rows": n_rows + 10 * batch_rows,
        "groups": n_groups,
        "n": 3,
        "mv_mode": mv_mode,
        "batch_rows": batch_rows,
        "epochs": 10,
        "bootstrap_sec": round(bootstrap_s, 3),
        "tick_p50_sec": round(statistics.median(ticks), 3),
        "tick_max_sec": round(max(ticks), 3),
        "ticks_sec": [round(x, 3) for x in ticks],
        "full_recompute_sec": round(full_s, 3),
        "mv_rows": mv_n,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def mv_chain_probe(n_rows: int, workdir: str) -> None:
    """MV-over-MV chain tick economics (VERDICT r16 #1): keep-latest
    (stage 1) -> agg rollup (stage 2), maintained from an ``n_rows``
    CDC source.  8 epochs of one upsert batch followed by a topological
    drain (tick1 + tick2), against the two-stage recompute the chain
    replaces (keep_latest over the whole source + full groupBy, both
    written out).  TWO pipelines run side by side off the same source
    commits, differing only in the UPSTREAM MV's tick mode — the
    feeder-mode guidance measured: a CoW stage-1 tick rewrites the
    whole MV, so stage 2's changelog window is O(MV rows); a MoR tick
    keeps it O(batch).  ``--batch-rows=N`` sets the epoch batch (20k
    default).  ``--downstream=keyed`` swaps stage 2 for a KEYED
    consumer (a keep-latest mirror of the feeder) — the shape where a
    CoW feeder is structurally catastrophic: touched_keys over a
    replace commit is EVERY key, so each downstream tick degrades to a
    full refresh; this flag measures that half of the guidance
    (epochs drop to 4 — the CoW side writes O(MV) rows per tick).
    Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.operators.dedup import (
        keep_latest,
    )
    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_agg_mv,
        maintain_keep_latest_mv,
    )

    batch_rows = 20_000
    downstream = "agg"
    for a in sys.argv:
        if a.startswith("--batch-rows="):
            batch_rows = int(a.split("=", 1)[1])
        if a.startswith("--downstream="):
            downstream = a.split("=", 1)[1]
    n_epochs = 8 if downstream == "agg" else 4
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="mv-chain-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    modes = {"mor": "merge-on-read", "cow": "copy-on-write"}
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    for tag in modes:
        for t in (f"mv1_{tag}", f"mv2_{tag}"):
            wh.create_table(
                "lab", t, "zstd", 1, properties={"snapshots": "true"}
            )
    n_groups = max(n_rows // 100, 1)
    wh.append(
        "lab", "src",
        spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % n_groups).alias("grp"),
            F.lit(0).alias("ts"),
            F.col("id").alias("eid"),
            ((F.col("id") * 2654435761) % 1000).alias("v"),
        ).repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    cks = {
        tag: (
            os.path.join(workdir, f"ck1_{tag}.json"),
            os.path.join(workdir, f"ck2_{tag}.json"),
        )
        for tag in modes
    }

    def drain(tag: str) -> tuple[float, float]:
        ck1, ck2 = cks[tag]
        t0 = time.perf_counter()
        maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", f"mv1_{tag}"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck1,
            mode=modes[tag],
        )
        t1 = time.perf_counter()
        if downstream == "keyed":
            maintain_keep_latest_mv(
                wh, ("lab", f"mv1_{tag}"), ("lab", f"mv2_{tag}"), ["k"],
                ts_col="ts", tie_col="eid", checkpoint_file=ck2,
            )
        else:
            maintain_agg_mv(
                wh, ("lab", f"mv1_{tag}"), ("lab", f"mv2_{tag}"), ["grp"],
                sum_cols=["v"], checkpoint_file=ck2,
            )
        return t1 - t0, time.perf_counter() - t1

    boot = {tag: drain(tag) for tag in modes}
    ticks: dict = {tag: {"t1": [], "t2": []} for tag in modes}
    for epoch in range(n_epochs):
        wh.merge_upsert(
            "lab", "src",
            spark.range(batch_rows).select(
                (((F.col("id") * 6151 + epoch * 17) % n_rows)).alias("k"),
                (
                    ((F.col("id") * 6151 + epoch * 17) % n_rows) % n_groups
                ).alias("grp"),
                F.lit(epoch + 1).alias("ts"),
                (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                ((F.col("id") * 48271 + epoch) % 1000).alias("v"),
            ),
            ["k"], mode="merge-on-read",
        )
        # alternate which pipeline drains first so neither always pays
        # the freshly-written-page cache penalty (the crossover-probe
        # ordering discipline)
        order = list(modes) if epoch % 2 == 0 else list(reversed(modes))
        for tag in order:
            a, b = drain(tag)
            ticks[tag]["t1"].append(a)
            ticks[tag]["t2"].append(b)
        if epoch % 4 == 3:
            for tag in modes:
                wh.optimize("lab", f"mv1_{tag}")
                wh.optimize("lab", f"mv2_{tag}")
            wh.optimize("lab", "src")
    # the cost a drain replaces: two-stage recompute written out
    t0 = time.perf_counter()
    latest = keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid")
    latest.write.mode("overwrite").parquet(os.path.join(workdir, "st1"))
    st1_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    st1_df = spark.read.parquet(os.path.join(workdir, "st1"))
    if downstream == "keyed":
        # stage-2 recompute for a keyed mirror = keep_latest over the
        # stage-1 output, written out (same plan the tick replaces)
        st2 = keep_latest(st1_df, ["k"], "ts", "eid")
        cmp_cols = ["k", "grp", "ts", "eid", "v"]
    else:
        st2 = st1_df.groupBy("grp").agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("sum_v"),
        )
        cmp_cols = ["grp", "cnt", "sum_v"]
    st2.write.mode("overwrite").parquet(os.path.join(workdir, "st2"))
    st2_s = time.perf_counter() - t0
    # end-to-end equality of both pipelines against the recompute
    exp = spark.read.parquet(os.path.join(workdir, "st2")).select(*cmp_cols)
    checks = {}
    for tag in modes:
        got = wh.read("lab", f"mv2_{tag}").select(*cmp_cols)
        checks[tag] = (
            got.exceptAll(exp).count() == 0
            and exp.exceptAll(got).count() == 0
        )
    assert all(checks.values()), checks
    out = {
        "probe": "mv_chain",
        "downstream": downstream,
        "rows": n_rows,
        "groups": n_groups,
        "batch_rows": batch_rows,
        "epochs": n_epochs,
        "recompute_stage1_sec": round(st1_s, 3),
        "recompute_stage2_sec": round(st2_s, 3),
        "recompute_total_sec": round(st1_s + st2_s, 3),
    }
    for tag in modes:
        out[f"{tag}_bootstrap_sec"] = [round(x, 3) for x in boot[tag]]
        out[f"{tag}_tick1_p50_sec"] = round(
            statistics.median(ticks[tag]["t1"]), 3
        )
        out[f"{tag}_tick2_p50_sec"] = round(
            statistics.median(ticks[tag]["t2"]), 3
        )
        out[f"{tag}_chain_p50_sec"] = round(
            statistics.median(
                [a + b for a, b in zip(ticks[tag]["t1"], ticks[tag]["t2"])]
            ),
            3,
        )
        out[f"{tag}_ticks_sec"] = [
            [round(a, 3), round(b, 3)]
            for a, b in zip(ticks[tag]["t1"], ticks[tag]["t2"])
        ]
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def auto_fold_probe(n_rows: int, workdir: str) -> None:
    """Delete-stack auto-fold A/B (VERDICT r17 #1): the r17 chain probe
    MEASURED MoR-fed downstream ticks growing between MANUAL compaction
    folds (2.9 -> 7.8 s at 4M) — this probe shows the r18
    ``maintenance_policy`` holding that series bounded with NO manual
    compaction anywhere.  TWO MoR keep-latest -> agg chains run side by
    side off the same source commits; the "pol" arm's ticks carry
    ``{"max_pending_delete_entries": 3}`` (folds fire from the tick
    path), the "nopol" arm never folds.  12 epochs, alternating drain
    order; per-epoch tick series printed so the growth-vs-bounded shape
    is visible, plus end-to-end equality of BOTH arms against the
    recompute (a fold must never change chain results).  Prints one
    JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.operators.dedup import (
        keep_latest,
    )
    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_agg_mv,
        maintain_keep_latest_mv,
    )

    batch_rows = 20_000
    n_epochs = 12
    for a in sys.argv:
        if a.startswith("--batch-rows="):
            batch_rows = int(a.split("=", 1)[1])
        if a.startswith("--epochs="):
            n_epochs = int(a.split("=", 1)[1])
    arms = {"pol": {"max_pending_delete_entries": 3}, "nopol": None}
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="auto-fold-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    for tag in arms:
        for t in (f"mv1_{tag}", f"mv2_{tag}"):
            wh.create_table(
                "lab", t, "zstd", 1, properties={"snapshots": "true"}
            )
    n_groups = max(n_rows // 100, 1)
    wh.append(
        "lab", "src",
        spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % n_groups).alias("grp"),
            F.lit(0).alias("ts"),
            F.col("id").alias("eid"),
            ((F.col("id") * 2654435761) % 1000).alias("v"),
        ).repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    cks = {
        tag: (
            os.path.join(workdir, f"ck1_{tag}.json"),
            os.path.join(workdir, f"ck2_{tag}.json"),
        )
        for tag in arms
    }
    folds = {tag: 0 for tag in arms}

    def drain(tag: str) -> tuple[float, float]:
        ck1, ck2 = cks[tag]
        t0 = time.perf_counter()
        r1 = maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", f"mv1_{tag}"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck1,
            mode="merge-on-read", maintenance_policy=arms[tag],
        )
        t1 = time.perf_counter()
        r2 = maintain_agg_mv(
            wh, ("lab", f"mv1_{tag}"), ("lab", f"mv2_{tag}"), ["grp"],
            sum_cols=["v"], checkpoint_file=ck2,
            maintenance_policy=arms[tag],
        )
        folds[tag] += ("auto_fold" in r1) + ("auto_fold" in r2)
        return t1 - t0, time.perf_counter() - t1

    boot = {tag: drain(tag) for tag in arms}
    ticks: dict = {tag: {"t1": [], "t2": []} for tag in arms}
    for epoch in range(n_epochs):
        wh.merge_upsert(
            "lab", "src",
            spark.range(batch_rows).select(
                (((F.col("id") * 6151 + epoch * 17) % n_rows)).alias("k"),
                (
                    ((F.col("id") * 6151 + epoch * 17) % n_rows) % n_groups
                ).alias("grp"),
                F.lit(epoch + 1).alias("ts"),
                (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                ((F.col("id") * 48271 + epoch) % 1000).alias("v"),
            ),
            ["k"], mode="merge-on-read",
        )
        order = list(arms) if epoch % 2 == 0 else list(reversed(arms))
        for tag in order:
            a, b = drain(tag)
            ticks[tag]["t1"].append(a)
            ticks[tag]["t2"].append(b)
        # NO manual compaction of anything — bounding the series is
        # entirely the policy's job (the r17 probe compacted by hand)
    t0 = time.perf_counter()
    latest = keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid")
    latest.write.mode("overwrite").parquet(os.path.join(workdir, "st1"))
    st2 = (
        spark.read.parquet(os.path.join(workdir, "st1"))
        .groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_v"))
    )
    st2.write.mode("overwrite").parquet(os.path.join(workdir, "st2"))
    rec_s = time.perf_counter() - t0
    exp = spark.read.parquet(os.path.join(workdir, "st2")).select(
        "grp", "cnt", "sum_v"
    )
    checks = {}
    for tag in arms:
        got = wh.read("lab", f"mv2_{tag}").select("grp", "cnt", "sum_v")
        checks[tag] = (
            got.exceptAll(exp).count() == 0
            and exp.exceptAll(got).count() == 0
        )
    assert all(checks.values()), checks
    half = n_epochs // 2
    out = {
        "probe": "auto_fold",
        "rows": n_rows,
        "batch_rows": batch_rows,
        "epochs": n_epochs,
        "policy_max_entries": 3,
        "recompute_total_sec": round(rec_s, 3),
    }
    for tag in arms:
        t2 = ticks[tag]["t2"]
        out[f"{tag}_folds"] = folds[tag]
        out[f"{tag}_bootstrap_sec"] = [round(x, 3) for x in boot[tag]]
        out[f"{tag}_tick1_p50_sec"] = round(
            statistics.median(ticks[tag]["t1"]), 3
        )
        out[f"{tag}_tick2_p50_sec"] = round(statistics.median(t2), 3)
        # growth signal: second-half vs first-half medians of the
        # downstream tick — the unbounded arm grows, the policy arm
        # must stay ~flat
        out[f"{tag}_tick2_firsthalf_p50"] = round(
            statistics.median(t2[:half]), 3
        )
        out[f"{tag}_tick2_secondhalf_p50"] = round(
            statistics.median(t2[half:]), 3
        )
        out[f"{tag}_ticks_sec"] = [
            [round(a, 3), round(b, 3)]
            for a, b in zip(ticks[tag]["t1"], t2)
        ]
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def fold_scoped_probe(n_rows: int, workdir: str) -> None:
    """Delete-SCOPED fold economics (VERDICT r18 #2): on a PARTITIONED
    CDC mirror whose MoR batches touch a few hot partitions,
    ``fold_pending_deletes`` must cost O(touched files) while the full
    ``optimize()`` fold costs O(table) — so the scoped cost stays ~flat
    across table sizes and scales with TOUCHED partitions instead.
    Five configs: {small, large} x {pending, full} + a touched-8 scoped
    run at the large size.  Each: seed a pday-partitioned mirror,
    compact, stack 6 MoR upsert batches confined to the touched
    partitions, then ONE timed fold; equality (count + value checksum)
    is asserted across every fold and the census must clear.  Prints
    one JSON line."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        keep_latest,
    )

    batch_rows = 10_000
    n_batches = 6
    sizes = {"small": max(n_rows // 4, 100_000), "large": n_rows}
    configs = [
        ("small", "pending", 2),
        ("small", "full", 2),
        ("large", "pending", 2),
        ("large", "full", 2),
        ("large", "pending", 8),
    ]
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="fold-scoped-probe")
    # warm the session before ANY timed arm (r13 bloom-probe lesson)
    spark.range(1_000_000).agg(F.sum("id")).collect()
    rows_out = []
    for size_tag, arm, touched in configs:
        sz = sizes[size_tag]
        wh = ParquetWarehouse(
            spark, os.path.join(workdir, f"wh_{size_tag}_{arm}_{touched}")
        )
        # the realistic CDC-mirror shape: key-RANGE partitioning (pday
        # tracks k), key-sorted files, and a HOT KEY TAIL — updates
        # land in the newest partitions, so the eq deletes' key_ranges
        # envelope provably excludes the cold files' bounds.  (A
        # key-scattered mirror has no file-skippable structure and the
        # scoped fold honestly degenerates toward full — the smoke run
        # measured exactly that.)
        span = sz // 32
        wh.create_table(
            "lab", "m", "zstd", 1,
            properties={"snapshots": "true"}, partitioning=["pday"],
            sort_order=["k"],
        )
        wh.append(
            "lab", "m",
            spark.range(sz).select(
                F.col("id").alias("k"),
                F.floor(F.col("id") / span).cast("int").alias("pday"),
                F.lit(0).alias("ts"),
                F.col("id").alias("eid"),
                ((F.col("id") * 2654435761) % 1000).alias("v"),
            ).repartition(32),
            batch_id="seed",
        )
        wh.optimize("lab", "m", target_file_size_bytes=64 * 1024 * 1024)
        lo = sz - touched * span  # hot tail: the top `touched` partitions
        # STRIDE the batch keys across the whole hot range so `touched`
        # actually governs how many partitions (and seed files) the eq
        # deletes reach — contiguous keys would touch one file only
        stride = max(1, (touched * span) // batch_rows)
        for e in range(n_batches):
            wh.merge_upsert(
                "lab", "m",
                spark.range(batch_rows).select(
                    (F.col("id") * stride + lo).alias("k"),
                    F.floor((F.col("id") * stride + lo) / span)
                    .cast("int")
                    .alias("pday"),
                    F.lit(e + 1).alias("ts"),
                    (F.col("id") + (e + 1) * sz).alias("eid"),
                    ((F.col("id") * 48271 + e) % 1000).alias("v"),
                ),
                ["k"], mode="merge-on-read",
            )
        st = wh.pending_delete_stats("lab", "m")
        chk_before = (
            wh.read("lab", "m")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64("k", "ts", "eid", "v"),
                        F.lit(1_000_000_007),
                    )
                ).alias("h"),
            )
            .collect()[0]
        )
        t0 = time.perf_counter()
        if arm == "pending":
            fold = wh.fold_pending_deletes("lab", "m")
        else:
            fold = {"files": wh.optimize("lab", "m")}
        dt = time.perf_counter() - t0
        chk_after = (
            wh.read("lab", "m")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64("k", "ts", "eid", "v"),
                        F.lit(1_000_000_007),
                    )
                ).alias("h"),
            )
            .collect()[0]
        )
        assert (chk_before["n"], chk_before["h"]) == (
            chk_after["n"], chk_after["h"],
        ), (size_tag, arm, touched)
        assert wh.pending_delete_stats("lab", "m") == {
            "entries": 0, "rows": 0,
        }
        # cross-check vs an independent keep-latest recompute count
        assert chk_after["n"] == keep_latest(
            wh.read("lab", "m"), ["k"], "ts", "eid"
        ).count()
        live = wh.head_snapshot("lab", "m")
        rows_out.append({
            "size": size_tag, "rows": sz, "arm": arm,
            "touched_partitions": touched,
            "pending_entries": st["entries"],
            "fold_sec": round(dt, 3),
            "victims": fold.get("victims"),
            "new_files": fold.get("files"),
            "live_files": len(live["files"]),
        })
    print(json.dumps({
        "probe": "fold_scoped",
        "batch_rows": batch_rows,
        "batches": n_batches,
        "partitions": 32,
        "runs": rows_out,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def ndv_decision_probe(n_rows: int, workdir: str) -> None:
    """NDV-informed merge_into discovery A/B (VERDICT r14 #6): at the
    keep-all shape (B distinct uniform keys >> table NDV / file — every
    live file holds batch keys), the r14 code still built a discrete
    2048-value membership spec and probed every file's bloom sidecar to
    keep them all; the r15 decision reads the manifest's per-file NDV,
    predicts ~zero skip, and passes the envelope instead.  Measures one
    2000-key merge_into per poll, best-of-3, decision ON vs FORCED
    membership (floor=0).  Prints one JSON line."""
    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="ndv-decision-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table(
        "lab", "t", "zstd", 1,
        properties={"snapshots": "true", "bloom_columns": "k"},
    )
    wh.append(
        "lab", "t",
        spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("int").alias("ts"),
            F.col("id").alias("eid"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
        ).repartition(256),
        batch_id="seed",
    )
    files = wh.head_snapshot("lab", "t")["files"]
    est = wh._membership_skip_estimate(files, ["k"], 2000)

    def batch(salt: int):
        return spark.range(2000).select(
            ((F.col("id") * 7919 + salt * 13) % n_rows).alias("k"),
            F.lit(salt + 1).cast("int").alias("ts"),
            (F.col("id") + (salt + 1) * n_rows).alias("eid"),
            F.sha2((F.col("id") + salt).cast("string"), 256).alias("v"),
        )

    def timed(salt: int) -> float:
        # cold bloom cache per poll — a fresh poller process's shape;
        # the decision's whole point is skipping the per-file blob
        # loads + membership checks on the keep-all path
        wh._bloom_cache.clear()
        t0 = time.perf_counter()
        wh.merge_into(
            "lab", "t", batch(salt), ["k"],
            matched_condition="s.ts > t.ts",
            mode="merge-on-read",
        )
        return time.perf_counter() - t0

    timed(0)  # warmup (JIT + caches) before any A/B (the r13 lesson)
    floor = ParquetWarehouse.MERGE_MEMBERSHIP_MIN_SKIP
    out = {
        "probe": "ndv_decision",
        "rows": n_rows,
        "files": len(files),
        "batch_keys": 2000,
        "predicted_skip": round(est, 6) if est is not None else None,
    }
    try:
        # alternate: forced-membership, decision-on, x3 each
        forced, decided = [], []
        salt = 1
        for _rep in range(3):
            ParquetWarehouse.MERGE_MEMBERSHIP_MIN_SKIP = 0.0
            forced.append(timed(salt))
            salt += 1
            ParquetWarehouse.MERGE_MEMBERSHIP_MIN_SKIP = floor
            decided.append(timed(salt))
            salt += 1
        out["forced_membership_best_sec"] = round(min(forced), 3)
        out["decision_best_sec"] = round(min(decided), 3)
        out["speedup"] = round(min(forced) / min(decided), 3)
    finally:
        ParquetWarehouse.MERGE_MEMBERSHIP_MIN_SKIP = floor
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def touched_poll_probe(n_files: int, workdir: str) -> None:
    """touched_keys poll cost vs LIVE-FILE count (VERDICT r14 #2): the
    r14 window walk materialized the full O(live files) entry dict per
    window commit; the r15 segment-level diff opens only the segments a
    commit changed, so a W-commit CDC poll should cost O(changed files)
    — FLAT as the table grows.  Builds tables at ``n_files`` and
    8x``n_files`` live files, lands W=8 small MoR upsert commits, and
    times the touched_keys call (plan build = the driver metadata walk)
    plus the full pull (collect).  Prints one JSON line."""
    import statistics

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="touched-poll-probe")
    out = {"probe": "touched_poll", "w": 8, "points": []}
    for mult in (1, 8):
        nf = n_files * mult
        wh = ParquetWarehouse(spark, os.path.join(workdir, f"wh{mult}"))
        wh.create_table(
            "lab", "t", "zstd", 1, properties={"snapshots": "true"}
        )
        wh.append(
            "lab", "t",
            spark.range(nf * 200).select(
                F.col("id").alias("k"),
                F.lit(0).cast("int").alias("ts"),
                F.col("id").alias("eid"),
                (F.col("id") % 997).cast("int").alias("v"),
            ).repartition(nf),
            batch_id="seed",
        )
        v0 = wh._latest_version("lab", "t")
        for e in range(8):
            wh.merge_upsert(
                "lab", "t",
                spark.range(50).select(
                    ((F.col("id") * 9973 + e) % (nf * 200)).alias("k"),
                    F.lit(e + 1).cast("int").alias("ts"),
                    (F.col("id") + (e + 1) * nf * 200).alias("eid"),
                    F.lit(e).cast("int").alias("v"),
                ).coalesce(1),
                ["k"], mode="merge-on-read",
            )
        v1 = wh._latest_version("lab", "t")
        # cold-ish walk: new warehouse instance (empty head/segment cache)
        build_s, pull_s, n_keys = [], [], 0
        for _rep in range(5):
            wh2 = ParquetWarehouse(spark, os.path.join(workdir, f"wh{mult}"))
            t0 = time.perf_counter()
            df = wh2.touched_keys("lab", "t", v0, v1, ["k"])
            build_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_keys = df.count()
            pull_s.append(time.perf_counter() - t0)
        out["points"].append({
            "live_files": nf,
            "touched_keys_build_ms_p50": round(
                statistics.median(build_s) * 1000, 2
            ),
            "pull_sec_p50": round(statistics.median(pull_s), 3),
            "keys": n_keys,
        })
    b = [p["touched_keys_build_ms_p50"] for p in out["points"]]
    out["build_ratio_8x_files"] = round(b[1] / b[0], 2) if b[0] else None
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def mv_steady_probe(n_rows: int, workdir: str) -> None:
    """Incremental-MV maintenance economics at scale (r12, the order-#6
    scale follow-up): a 20k-row CDC epoch lands on a ``n_rows``-key
    SOURCE table, then ``maintain_keep_latest_mv`` ticks — 10 epochs,
    MV maintenance fold every 4.  The delta-scoped refresh is O(touched
    keys) in what it WRITES but reads the source through one semi-join
    per tick (keys uniformly spread -> full scan; the same inherent
    discovery cost as conditional MERGE), so the probe records the
    honest tick wall time plus the batch-recompute time it replaces.
    Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.operators.dedup import keep_latest
    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_keep_latest_mv,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="mv-steady-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    for t in ("src", "mv"):
        wh.create_table("lab", t, "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "src",
        spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("int").alias("ts"),
            F.col("id").alias("eid"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
        ).repartition(32),
        batch_id="seed",
    )
    wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    ckpt = os.path.join(workdir, "ck.json")
    t0 = time.perf_counter()
    out0 = maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ckpt,
    )
    bootstrap_s = time.perf_counter() - t0
    assert out0["keys_refreshed"] == -1
    batch_n = 20_000
    ticks = []
    for epoch in range(10):
        wh.append(
            "lab", "src",
            spark.range(batch_n).select(
                ((F.col("id") * 6151 + epoch) % n_rows).alias("k"),
                F.lit(epoch + 1).cast("int").alias("ts"),
                (F.col("id") + (epoch + 1) * n_rows).alias("eid"),
                F.sha2((F.col("id") + epoch).cast("string"), 256).alias("v"),
            ),
            batch_id=f"e{epoch}",
        )
        t0 = time.perf_counter()
        r = maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ckpt,
        )
        ticks.append(time.perf_counter() - t0)
        assert r["delivered"] is True
        if epoch % 4 == 3:
            wh.optimize("lab", "mv", target_file_size_bytes=128 * 1024 * 1024)
            wh.optimize("lab", "src", target_file_size_bytes=128 * 1024 * 1024)
    # the number the MV replaces: one full batch recompute + rewrite
    t0 = time.perf_counter()
    keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid").write.mode(
        "overwrite"
    ).parquet(os.path.join(workdir, "full_recompute"))
    full_s = time.perf_counter() - t0
    # convergence cross-check at scale
    mv_n = wh.read("lab", "mv").count()
    exp_n = keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid").count()
    assert mv_n == exp_n, (mv_n, exp_n)
    print(json.dumps({
        "probe": "mv_steady",
        "source_keys": n_rows,
        "batch_rows": batch_n,
        "epochs": 10,
        "bootstrap_sec": round(bootstrap_s, 3),
        "tick_p50_sec": round(statistics.median(ticks), 3),
        "tick_max_sec": round(max(ticks), 3),
        "ticks_sec": [round(x, 3) for x in ticks],
        "full_recompute_sec": round(full_s, 3),
        "mv_rows": mv_n,
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def mor_steady_probe(n_rows: int, workdir: str) -> None:
    """Steady-state merge-on-read CDC at scale (VERDICT r8 #5): a keyed
    snapshot table of ``n_rows`` keys maintained by
    ``stream_upsert_latest_into_warehouse(mode='merge-on-read',
    maintenance_every=5)`` over 20 micro-batches of updates — the r06
    ingest-cadence protocol, now with equality deletes in the loop.

    Measures per-epoch ``merge_upsert`` commit latency (each epoch is
    O(batch): new images + one eq delete of the batch keys), the
    maintenance-tick fold cost, and the pending-delete read tax between
    ticks (read with stacked un-folded CDC batches vs after the fold).
    Prints one JSON line."""
    import statistics

    from hands_on_iceberg_compression_spark.streaming.events_stream import (
        stream_upsert_latest_into_warehouse,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="mor-steady-probe")
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    schema, table = "streams", "cdc_steady"
    wh.create_table(schema, table, "zstd", 1, properties={"snapshots": "true"})

    etypes = "click view purchase refund".split()
    def rows_frame(ids, ts_off_expr):
        # (id // 4, id % 4) is a bijection over [0, n_rows) — exactly
        # n_rows distinct (user_id, event_type) keys, no accidental
        # correlation (id % (n//4) would determine id % 4 when 4 | n//4)
        return ids.select(
            F.floor(F.col("id") / 4).cast("long").alias("user_id"),
            F.element_at(
                F.array(*[F.lit(e) for e in etypes]),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("event_type"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=ts_off_expr)).alias("ts"),
            F.col("id").alias("event_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )

    # base snapshot: one row per (user_id, event_type) key — n_rows keys
    t0 = time.perf_counter()
    base = rows_frame(spark.range(n_rows).repartition(32), F.lit(0))
    wh.append(schema, table, base, batch_id="base")
    load_s = time.perf_counter() - t0

    # 20 CDC files, each updating `batch` existing keys with a newer ts
    # (epoch e touches a rotating slice so ticks fold real churn)
    n_epochs, batch = 20, max(10_000, n_rows // 200)
    stage = os.path.join(workdir, "cdc_in")
    for e in range(n_epochs):
        ids = spark.range(e * batch, (e + 1) * batch).select(
            ((F.col("id") * 2654435761) % n_rows).alias("id")
        )
        # ONE file per epoch: the stream's maxFilesPerTrigger=1 defines a
        # micro-batch as a file, so a multi-file epoch dir would split
        # into several epochs (the 200k smoke measured 80 merges, not 20)
        upd = rows_frame(ids.coalesce(1), F.lit(e + 1))
        upd.write.mode("overwrite").parquet(
            os.path.join(stage, f"epoch_{e:03d}")
        )

    # instrument the warehouse calls the sink makes (instance attributes
    # shadow the methods; the sink sees the same object)
    merge_secs, fold_secs = [], []
    orig_mu, orig_opt = wh.merge_upsert, wh.optimize
    def timed_mu(*a, **kw):
        t0 = time.perf_counter()
        r = orig_mu(*a, **kw)
        merge_secs.append(time.perf_counter() - t0)
        return r
    def timed_opt(*a, **kw):
        t0 = time.perf_counter()
        r = orig_opt(*a, **kw)
        fold_secs.append(time.perf_counter() - t0)
        return r
    wh.merge_upsert, wh.optimize = timed_mu, timed_opt

    stream_schema = wh.read(schema, table).schema
    events = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "epoch_*"))
    )
    t0 = time.perf_counter()
    stream_upsert_latest_into_warehouse(
        events, wh, schema, table,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        mode="merge-on-read",
        maintenance_every=5,
    )
    stream_s = time.perf_counter() - t0
    wh.merge_upsert, wh.optimize = orig_mu, orig_opt

    def timed_read():
        best = float("inf")
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = (
                wh.read(schema, table)
                .filter(F.col("event_type") == "purchase")
                .count()
            )
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    # steady-state invariant: every update replaced a row, none added
    assert wh.head_snapshot(schema, table)["total_rows"] >= n_rows
    t_folded0, rows_folded0 = timed_read()

    # phase 2: stack 3 un-maintained MoR CDC batches, measure the
    # between-ticks read tax, then one fold
    for e in range(3):
        ids = spark.range(e * batch, (e + 1) * batch).select(
            ((F.col("id") * 97 + 13) % n_rows).alias("id")
        )
        upd = rows_frame(ids.repartition(4), F.lit(100 + e))
        wh.merge_upsert(
            schema, table, upd, ["user_id", "event_type"],
            mode="merge-on-read",
        )
    pend = wh.delete_files_report(schema, table)
    t_pending, rows_pending = timed_read()
    t0 = time.perf_counter()
    wh.optimize(schema, table)
    final_fold_s = time.perf_counter() - t0
    t_folded, rows_folded = timed_read()
    assert rows_pending == rows_folded, (rows_pending, rows_folded)

    out = {
        "probe": "mor_steady",
        "n_rows": n_rows,
        "epochs": n_epochs,
        "batch_rows": batch,
        "base_load_sec": round(load_s, 1),
        "stream_total_sec": round(stream_s, 1),
        "merge_epoch_sec": {
            "p50": round(statistics.median(merge_secs), 3),
            "p95": round(sorted(merge_secs)[int(0.95 * len(merge_secs))], 3),
            "max": round(max(merge_secs), 3),
            "n": len(merge_secs),
        },
        "maintenance_tick_sec": [round(s, 1) for s in fold_secs],
        "pending_delete_files": len(pend),
        "pending_delete_rows": sum(d.get("rows", 0) for d in pend),
        "read_sec": {
            "folded_baseline": t_folded0,
            "pending_3_batches": t_pending,
            "after_fold": t_folded,
            "tax_vs_folded_baseline": (
                round(t_pending / t_folded0, 2) if t_folded0 else None
            ),
        },
        "final_fold_sec": round(final_fold_s, 1),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def _baseline_shapes() -> dict:
    """The four baseline query shapes (temp.md:42-105) — shared by the
    sequential probe and the interleaved A/B."""
    return {
        "count_eq_varchar": lambda d: d.filter(F.col("row_3") == "433b0fa").count(),
        "count_ts_between": lambda d: d.filter(
            F.col("row_1").between(
                F.lit("2024-03-01 00:00:00").cast("timestamp"),
                F.lit("2024-04-01 00:00:00").cast("timestamp"),
            )
        ).count(),
        "count_like_infix": lambda d: d.filter(F.col("row_32").like("%50c%")).count(),
        "flagship": lambda d: d.filter(
            (F.col("row_16") < 80)
            & F.col("row_1").between(
                F.lit("2024-02-01 00:00:00").cast("timestamp"),
                F.lit("2024-10-01 00:00:00").cast("timestamp"),
            )
            & F.col("row_32").like("%50c%")
        ).count(),
    }


def _hardlink_tree(src: str, dst: str) -> None:
    """cp -al: clone a data dir with hard links (zero data bytes copied) so
    two table layouts can coexist without doubling disk."""
    for base, _dirs, fns in os.walk(src):
        rel = os.path.relpath(base, src)
        os.makedirs(os.path.join(dst, rel), exist_ok=True)
        for fn in fns:
            os.link(os.path.join(base, fn), os.path.join(dst, rel, fn))


def percol_ab_probe(n_rows: int, workdir: str) -> None:
    """INTERLEAVED default-vs-per-column-codec comparison (VERDICT r4 #4).

    The sequential --percol protocol times the default layout, spends ~8
    minutes rewriting, then times per-column — on a shared-host microVM
    with a documented ~4x IO band, the host can shift between phases and
    the comparison silently becomes a host-day measurement (r4's 100M
    attempt; PERF.md).  Here both layouts exist simultaneously (the
    per-column table starts as a hard-link clone, then rewrites) and every
    round times default THEN percol back-to-back per shape, so both face
    the same host state; host canaries (bench._host_canary) bracket the
    phases to make residual drift visible.  Warm best-of-4 per
    layout/shape; prints one JSON line."""
    from bench import _host_canary

    shutil.rmtree(workdir, ignore_errors=True)
    canaries = {"pre": _host_canary()}
    spark = make_session(app_name="percol-ab")
    cfg = wide_events_config()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    t_def, t_pc = "events_default", "events_percol"
    wh.create_table(cfg.schema, t_def, "zstd", 6)
    plan = LoadPlan(
        total_rows=n_rows,
        batch_rows=max(250_000, n_rows // 8),
        concurrency=4,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        compact_after_load=False,
        partitions_per_batch=32,
        progress=False,
    )
    load_table(spark, wh, cfg, table=t_def, plan=plan)
    wh.optimize(cfg.schema, t_def, target_file_size_bytes=512 * 1024 * 1024)

    from hands_on_iceberg_compression_spark.sources.warehouse import (
        string_column_overrides,
    )

    wh.create_table(cfg.schema, t_pc, "zstd", 6)
    src = os.path.join(wh._tdir(cfg.schema, t_def), "data")
    dst = os.path.join(wh._tdir(cfg.schema, t_pc), "data")
    shutil.rmtree(dst, ignore_errors=True)
    _hardlink_tree(src, dst)
    overrides = string_column_overrides(wh.read(cfg.schema, t_def), "zstd", 1)
    t0 = time.perf_counter()
    wh.rewrite_per_column_codec(cfg.schema, t_pc, overrides, max_workers=16)
    rewrite_s = time.perf_counter() - t0
    canaries["mid"] = _host_canary()

    frames = {"default": wh.read(cfg.schema, t_def), "percol": wh.read(cfg.schema, t_pc)}
    sizes = {
        label: measure_sizes(wh, cfg.schema, t, "zstd", 6).bytes_per_row
        for label, t in (("default", t_def), ("percol", t_pc))
    }
    shapes = _baseline_shapes()
    best: dict[str, dict[str, float]] = {"default": {}, "percol": {}}
    rows_seen: dict[str, dict[str, int]] = {"default": {}, "percol": {}}
    for _ in range(4):
        for name, fn in shapes.items():
            for label, d in frames.items():
                t0 = time.perf_counter()
                rows_seen[label][name] = fn(d)
                el = time.perf_counter() - t0
                cur = best[label].get(name, float("inf"))
                best[label][name] = min(cur, el)
    assert rows_seen["default"] == rows_seen["percol"], rows_seen
    canaries["post"] = _host_canary()
    report = {
        "probe": "percol_interleaved_ab",
        "n_rows": n_rows,
        "rewrite_sec": round(rewrite_s, 1),
        "bytes_per_row": sizes,
        "canaries": canaries,
        "queries": {
            label: {
                name: {
                    "sec": round(s, 3),
                    "mrows_per_s": round(n_rows / s / 1e6, 1),
                }
                for name, s in shape_times.items()
            }
            for label, shape_times in best.items()
        },
    }
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def commit_latency_probe(
    n_commits: int, workdir: str, maintain_every: int | None = None
) -> None:
    """Commit-cost curve at streaming ingest rates (VERDICT r5 #6): drive a
    partitioned log-mode table to ``n_commits`` single-file generations —
    the foreachBatch micro-batch shape, including each append's
    ``drop_prefix`` supersession check — and record, per milestone window
    (last 100 commits before 100/500/1000): commit latency p50/p95/max,
    manifest bytes written per commit, head-read time, and full-read
    wall time (collapsed single-scan shape past 16 generations).  With the
    r6 manifest-list layer all of these must be FLAT in commit count; the
    r5 monolithic manifest grew every one of them linearly.  Expiry and
    the orphan sweep are allowed O(history) — their wall time is reported,
    not bounded.  Prints one JSON line."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="commit-latency")
    # JVM/session warmup so the first milestone's full_read_sec measures
    # the read, not Spark startup (same posture as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    wh.create_table(
        "lab", "ingest", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=["days(ts)"],
    )
    tdir = wh._tdir("lab", "ingest")
    snap = wh._snap_dir("lab", "ingest")
    days = [f"2024-03-{d:02d}" for d in range(1, 31)]

    def snap_bytes() -> int:
        if not os.path.isdir(snap):
            return 0
        return sum(os.path.getsize(os.path.join(snap, fn)) for fn in os.listdir(snap))

    milestones = sorted({m for m in (100, 500, 1000) if m <= n_commits} | {n_commits})
    lat: list[float] = []
    bytes_at: dict[int, int] = {0: 0}
    windows: list[dict] = []
    maintain_s = 0.0
    for i in range(n_commits):
        d = os.path.join(
            tdir, "data", f"b{i:05d}", "g_p", f"ts_day={days[i % len(days)]}"
        )
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "part-0.parquet")
        pq.write_table(pa.table({"id": pa.array([i], pa.int64())}), p)
        t0 = time.perf_counter()
        wh.commit_snapshot(
            "lab", "ingest", "append", add_files=[p],
            drop_prefix=os.path.join(tdir, "data", f"b{i:05d}") + os.sep,
        )
        lat.append(time.perf_counter() - t0)
        if maintain_every and (i + 1) % maintain_every == 0:
            # the ingest-cadence maintenance shape: scoped compaction of
            # the touched day range (here: all cycled days)
            t0 = time.perf_counter()
            wh.optimize(
                "lab", "ingest", 128 * 1024 * 1024,
                partition_filter={"ts_day": (days[0], days[-1])},
            )
            maintain_s += time.perf_counter() - t0
        v = i + 1
        if v in milestones:
            bytes_at[v] = snap_bytes()
            window = sorted(lat[-100:])
            t0 = time.perf_counter()
            head = wh.head_snapshot("lab", "ingest")
            head_ms = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            n_read = wh.read("lab", "ingest").count()
            read_s = time.perf_counter() - t0
            assert n_read == v, (n_read, v)
            prev = max(m for m in bytes_at if m < v)
            windows.append({
                "commits": v,
                "lat_p50_ms": round(window[len(window) // 2] * 1e3, 2),
                "lat_p95_ms": round(window[int(len(window) * 0.95) - 1] * 1e3, 2),
                "lat_max_ms": round(window[-1] * 1e3, 2),
                "manifest_bytes_per_commit": round(
                    (bytes_at[v] - bytes_at[prev]) / (v - prev)
                ),
                "head_refs": len(head["segments"]),
                "live_files": len(head["files"]),
                "head_read_ms": round(head_ms, 2),
                "full_read_sec": round(read_s, 2),
            })
    t0 = time.perf_counter()
    expired = wh.expire_snapshots("lab", "ingest", keep_last=1)
    expire_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    orphans = wh.remove_orphan_files("lab", "ingest", older_than_s=0)
    orphan_s = time.perf_counter() - t0
    assert wh.read("lab", "ingest").count() == n_commits
    print(json.dumps({
        "probe": "commit_latency",
        "n_commits": n_commits,
        "maintain_every": maintain_every,
        "maintain_total_sec": round(maintain_s, 2) if maintain_every else None,
        "windows": windows,
        "total_manifest_bytes": snap_bytes(),
        "expired": expired,
        "expire_sec": round(expire_s, 2),
        "orphans_removed": orphans,
        "orphan_sweep_sec": round(orphan_s, 2),
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def broad_deletes_probe(n_files: int, workdir: str) -> None:
    """The VERDICT r8 #1 'done' gate: commit bytes/latency must stay FLAT
    while BROAD equality deletes are pending.  Build an ``n_files`` table
    whose per-file id bounds all overlap (so key pruning can prove
    nothing — the GDPR scattered-key worst case that made the r08
    target-list design O(live files) per delete, rewritten into EVERY
    subsequent head), measure an append window, commit 10 scattered-key
    ``delete_by_keys`` (1000 keys each), measure another append window,
    and compare: head bytes and per-commit latency/manifest-bytes must
    not grow with pending-delete breadth.  Everything except the final
    correctness read is driver-side (zero Spark jobs) — the delete and
    append paths under test are pure metadata.  Prints one JSON line."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(workdir, ignore_errors=True)
    root = os.path.join(workdir, "wh")
    wh = ParquetWarehouse(None, root)
    wh.create_table("lab", "broad", "zstd", 1, properties={"snapshots": "true"})
    tdir = wh._tdir("lab", "broad")
    snap = wh._snap_dir("lab", "broad")
    fields = [{"name": "id", "type": "bigint"}]
    hi = 10 * n_files

    def write_file(tag: str, j: int, ids: list[int]) -> str:
        d = os.path.join(tdir, "data", f"{tag}{j:05d}", "g_0")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "part-0.parquet")
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), p)
        return p

    def head_bytes() -> int:
        v = wh._latest_version("lab", "broad")
        return os.path.getsize(os.path.join(snap, f"v{v:06d}.json"))

    # every file spans [j, hi - j]: bounds overlap ANY mid-range key, so
    # the manifest can prune nothing — all files are candidates
    batch = 20
    for j in range(0, n_files, batch):
        files = [
            write_file("b", j + k, [j + k, hi - (j + k)])
            for k in range(min(batch, n_files - j))
        ]
        wh.commit_snapshot(
            "lab", "broad", "append", add_files=files, schema_fields=fields
        )

    def append_window(tag: str, n: int) -> dict:
        lat = []
        b0 = _snap_dir_bytes(snap)
        for i in range(n):
            p = write_file(tag, i, [hi + i, hi + i])
            t0 = time.perf_counter()
            wh.commit_snapshot(
                "lab", "broad", "append", add_files=[p],
                schema_fields=fields,
            )
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return {
            "lat_p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
            "lat_p95_ms": round(lat[int(len(lat) * 0.95) - 1] * 1e3, 2),
            "manifest_bytes_per_commit": round((_snap_dir_bytes(snap) - b0) / n),
            "head_bytes": head_bytes(),
        }

    before = append_window("w0_", 100)
    deletes = []
    # scattered keys strictly INSIDE every file's [j, hi-j] envelope (and
    # colliding with no real id): pruning can prove nothing, every file
    # stays a candidate — the r08 worst case where stored target lists
    # were O(live files) per delete
    n_keys = max(100, hi // 20)
    for k in range(10):
        keys = [hi // 5 + k + 10 * i for i in range(n_keys)]
        t0 = time.perf_counter()
        out = wh.delete_by_keys("lab", "broad", keys, eq_cols=["id"])
        deletes.append({
            "sec": round(time.perf_counter() - t0, 4),
            "delete_bytes": out["delete_bytes"],
            "candidate_files": out["targets"],
            "head_bytes": head_bytes(),
        })
    after = append_window("w1_", 100)
    head = wh._head_light("lab", "broad")
    dseg_bytes = sum(
        os.path.getsize(os.path.join(snap, r["path"]))
        for r in head.get("delete_segments", [])
    )
    # correctness: one Spark read with 10 broad deletes pending.  The
    # keys collide with no real id, so every row survives — the read
    # pays the full anti-join against all 10 pending deletes (the
    # pending-read-tax shape) and must still count exactly.
    spark = make_session(app_name="broad-deletes")
    wh.spark = spark
    n = wh.read("lab", "broad").count()
    expect = 2 * (n_files + 200)
    assert n == expect, (n, expect)
    print(json.dumps({
        "probe": "broad_deletes",
        "n_files": n_files,
        "append_window_before": before,
        "deletes": deletes,
        "append_window_after": after,
        "pending_delete_entries": len(wh.delete_files_report("lab", "broad")),
        "delete_segment_refs": len(head.get("delete_segments", [])),
        "delete_segment_bytes": dseg_bytes,
        "rows_after_deletes": n,
        "head_bytes_growth_ratio": round(
            after["head_bytes"] / before["head_bytes"], 3
        ),
    }))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def _snap_dir_bytes(snap: str) -> int:
    return sum(
        os.path.getsize(os.path.join(snap, fn)) for fn in os.listdir(snap)
    )


def evolution_probe(n_rows: int, workdir: str) -> None:
    """Schema-evolution read overhead at scale (r07): the same rows in a
    UNIFORM table (one schema, flat single scan) vs an EVOLVED table
    whose four generations were written under four different schema ids
    (add + rename + widen between appends), so the read takes the
    sid-grouped path — four scans projected through the field-id mapping
    and unioned.  Scan volume is identical; the probe measures what the
    extra plan shape costs on full reads and aggregates (warm best-of-3).
    Prints one JSON line."""
    from pyspark.sql import functions as F

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="evolution-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    per_gen = n_rows // 4

    def gen(i: int, cols: dict) -> "object":
        df = spark.range(i * per_gen, (i + 1) * per_gen).toDF("id")
        for name, expr in cols.items():
            df = df.withColumn(name, expr)
        return df.coalesce(4)

    base_cols = {
        "v": (F.col("id") % 1000).cast("double"),
        "s": F.concat(F.lit("u"), (F.col("id") % 97).cast("string")),
        "n": (F.col("id") % 7).cast("int"),
    }
    for name in ("uniform", "evolved"):
        wh.create_table("lab", name, "zstd", 1, properties={"snapshots": "true"})
    # uniform: four generations, one schema
    final_cols = dict(base_cols)
    final_cols["label"] = final_cols.pop("s")
    final_cols["n"] = (F.col("id") % 7).cast("bigint")
    final_cols["extra"] = (F.col("id") % 3).cast("int")
    for i in range(4):
        wh.append("lab", "uniform", gen(i, final_cols), batch_id=f"g{i}")
    # evolved: DDL between every pair of generations -> four schema ids
    wh.append("lab", "evolved", gen(0, base_cols), batch_id="g0")
    wh.add_column("lab", "evolved", "extra", "int")
    g1_cols = dict(base_cols)
    g1_cols["extra"] = (F.col("id") % 3).cast("int")
    wh.append("lab", "evolved", gen(1, g1_cols), batch_id="g1")
    wh.rename_column("lab", "evolved", "s", "label")
    g2_cols = dict(g1_cols)
    g2_cols["label"] = g2_cols.pop("s")
    wh.append("lab", "evolved", gen(2, g2_cols), batch_id="g2")
    wh.update_column_type("lab", "evolved", "n", "bigint")
    g3_cols = dict(g2_cols)
    g3_cols["n"] = (F.col("id") % 7).cast("bigint")
    wh.append("lab", "evolved", gen(3, g3_cols), batch_id="g3")
    head = wh.head_snapshot("lab", "evolved")
    sids = sorted({e.get("sid", 0) for e in head["files"]})

    def best(fn) -> float:
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            t = min(t, time.perf_counter() - t0)
        return round(t, 3)

    out = {"probe": "evolution_read", "rows": n_rows, "sids": sids}
    for name in ("uniform", "evolved"):
        df = wh.read("lab", name)
        assert df.count() == per_gen * 4
        assert set(df.columns) == {"id", "v", "label", "n", "extra"}
        out[f"{name}_read_sec"] = best(
            lambda: wh.read("lab", name).count()
        )
        out[f"{name}_agg_sec"] = best(
            lambda: wh.read("lab", name)
            .groupBy("label")
            .agg(F.sum("v"), F.sum("n"), F.count("*"))
            .collect()
        )
        out[f"{name}_filter_sec"] = best(
            lambda: wh.read_where("lab", name, "v BETWEEN 10 AND 20").count()
        )
    # cross-check: identical results on the always-present columns, and
    # exactly generation 0 (written before add_column) NULL in 'extra'
    u = wh.read("lab", "uniform").groupBy().agg(
        F.sum("v"), F.sum("n"), F.count("*")
    ).collect()[0]
    e = wh.read("lab", "evolved").groupBy().agg(
        F.sum("v"), F.sum("n"), F.count("*")
    ).collect()[0]
    assert tuple(u) == tuple(e), (u, e)
    assert (
        wh.read("lab", "evolved").filter(F.col("extra").isNull()).count()
        == per_gen
    )
    out["read_ratio"] = round(out["evolved_read_sec"] / out["uniform_read_sec"], 3)
    out["agg_ratio"] = round(out["evolved_agg_sec"] / out["uniform_agg_sec"], 3)
    # the remediation: compaction rewrites every file under the CURRENT
    # schema (optimize reads through the projection), so a maintained
    # table pays the mixed-schema plan shape only between compactions
    for name in ("uniform", "evolved"):
        wh.optimize("lab", name, target_file_size_bytes=16 * 1024 * 1024)
    head2 = wh.head_snapshot("lab", "evolved")
    out["compacted_sids"] = sorted({e.get("sid", 0) for e in head2["files"]})
    out["evolved_compacted_agg_sec"] = best(
        lambda: wh.read("lab", "evolved")
        .groupBy("label")
        .agg(F.sum("v"), F.sum("n"), F.count("*"))
        .collect()
    )
    out["uniform_compacted_agg_sec"] = best(
        lambda: wh.read("lab", "uniform")
        .groupBy("label")
        .agg(F.sum("v"), F.sum("n"), F.count("*"))
        .collect()
    )
    out["compacted_agg_ratio"] = round(
        out["evolved_compacted_agg_sec"] / out["uniform_compacted_agg_sec"], 3
    )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def spec_evolution_probe(n_rows: int, workdir: str) -> None:
    """Partition-spec-evolution read/prune economics at scale (r12): the
    same rows in a UNIFORM table (days(ts) from creation) vs an EVOLVED
    table whose first half was written UNPARTITIONED and second half
    after ``add_partition_field("days(ts)")`` — the read takes the
    (sid, pid)-grouped path with the derived column COMPUTED for the old
    half.  Measures full reads, a ts_day point filter (prunable only on
    the new half of the evolved table), manifest prune counts, and the
    post-optimize convergence (one spec, full pruning).  Warm best-of-3;
    one JSON line."""
    from pyspark.sql import functions as F

    shutil.rmtree(workdir, ignore_errors=True)
    spark = make_session(app_name="spec-evolution-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    half = n_rows // 2

    def gen(i: int):
        return (
            spark.range(i * half, (i + 1) * half)
            .toDF("id")
            .withColumn(
                "ts",
                F.expr(
                    "timestamp'2024-01-01 00:00:00' "
                    "+ make_interval(0,0,0,0,0,0, id % 1382400)"  # 16 days
                ),
            )
            .withColumn("v", (F.col("id") % 1000).cast("double"))
            .coalesce(8)
        )

    wh.create_table(
        "lab", "uniform", "zstd", 1,
        properties={"snapshots": "true"}, partitioning=["days(ts)"],
    )
    wh.create_table(
        "lab", "evolved", "zstd", 1, properties={"snapshots": "true"}
    )
    for i in range(2):
        wh.append("lab", "uniform", gen(i), batch_id=f"g{i}")
    wh.append("lab", "evolved", gen(0), batch_id="g0")
    wh.add_partition_field("lab", "evolved", "days(ts)")
    wh.append("lab", "evolved", gen(1), batch_id="g1")

    def best(fn) -> float:
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            t = min(t, time.perf_counter() - t0)
        return round(t, 3)

    day = "2024-01-05"
    rng = {"ts_day": (day, day)}
    out = {"probe": "spec_evolution", "rows": n_rows}
    for name in ("uniform", "evolved"):
        df = wh.read("lab", name)
        assert df.count() == n_rows
        assert df.filter(F.col("ts_day") != F.to_date("ts")).count() == 0
        out[f"{name}_read_sec"] = best(lambda: wh.read("lab", name).count())
        out[f"{name}_day_filter_sec"] = best(
            lambda: wh.read("lab", name)
            .filter(F.col("ts_day") == F.lit(day))
            .count()
        )
        kept, total = wh.prune_files("lab", name, rng)
        out[f"{name}_prune"] = f"{len(kept)}/{total}"
        out[f"{name}_pruned_filter_sec"] = best(
            lambda: wh.read_pruned("lab", name, rng)
            .filter(F.col("ts_day") == F.lit(day))
            .count()
        )
    # identical answers across layouts
    u = wh.read("lab", "uniform").filter(
        F.col("ts_day") == F.lit(day)
    ).count()
    e = wh.read("lab", "evolved").filter(
        F.col("ts_day") == F.lit(day)
    ).count()
    assert u == e, (u, e)
    out["day_rows"] = u
    # remediation: compaction converges the evolved table to ONE spec
    wh.optimize("lab", "evolved", target_file_size_bytes=32 * 1024 * 1024)
    head = wh.head_snapshot("lab", "evolved")
    out["compacted_pids"] = sorted({x.get("pid", 0) for x in head["files"]})
    kept, total = wh.prune_files("lab", "evolved", rng)
    out["evolved_compacted_prune"] = f"{len(kept)}/{total}"
    out["evolved_compacted_pruned_filter_sec"] = best(
        lambda: wh.read_pruned("lab", "evolved", rng)
        .filter(F.col("ts_day") == F.lit(day))
        .count()
    )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sorted_by_ts = "--sorted" in sys.argv
    # --percol: after the baseline pass, rewrite string columns to zstd-1
    # (per-column codec via warehouse.rewrite_per_column_codec) and re-measure
    # — the LIKE-floor experiment (VERDICT r2 #5, PERF.md round 3)
    percol = "--percol" in sys.argv
    n_rows = int(args[0]) if args else 2_000_000
    workdir = args[1] if len(args) > 1 else "/tmp/throughput_probe"
    _auto_driver_mem(n_rows)
    if "--commit-latency" in sys.argv:
        # positional arg means COMMITS here, not rows; tiny default;
        # --maintain adds the ingest-cadence scoped compaction every 100
        commit_latency_probe(
            n_rows if args else 1000, workdir,
            maintain_every=100 if "--maintain" in sys.argv else None,
        )
        return
    if "--broad-deletes" in sys.argv:
        # positional arg means FILES here; 1000-file default (the judge's
        # 'done' gate shape for VERDICT r8 #1)
        broad_deletes_probe(n_rows if args else 1000, workdir)
        return
    if "--prune" in sys.argv:
        prune_probe(n_rows, workdir)
        return
    if "--spec-evolution" in sys.argv:
        spec_evolution_probe(n_rows if args else 10_000_000, workdir)
        return
    if "--merge-into" in sys.argv:
        merge_into_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--mv-steady" in sys.argv:
        mv_steady_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--bloom" in sys.argv:
        bloom_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--agg-crossover" in sys.argv:
        agg_mv_crossover_probe(workdir)
        return
    if "--agg-mv" in sys.argv:
        agg_mv_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--tick-jobs" in sys.argv:
        tick_jobs_probe(n_rows if args else 500_000, workdir)
        return
    if "--join-mv" in sys.argv:
        join_mv_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--topn-mv" in sys.argv:
        topn_mv_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--mv-chain" in sys.argv:
        mv_chain_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--auto-fold" in sys.argv:
        auto_fold_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--fold-scoped" in sys.argv:
        fold_scoped_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--ndv-decision" in sys.argv:
        ndv_decision_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--touched-poll" in sys.argv:
        # positional arg means base FILE COUNT here (second point is 8x)
        touched_poll_probe(n_rows if args else 256, workdir)
        return
    if "--merge-batched" in sys.argv:
        merge_batched_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--mv-bloom" in sys.argv:
        mv_bloom_probe(n_rows if args else 4_000_000, workdir)
        return
    if "--evolution" in sys.argv:
        evolution_probe(n_rows if args else 1_000_000, workdir)
        return
    if "--percol-ab" in sys.argv:
        percol_ab_probe(n_rows, workdir)
        return
    if "--zorder" in sys.argv:
        zorder_probe(n_rows if args else 10_000_000, workdir)
        return
    if "--count-fastpath" in sys.argv:
        count_fastpath_probe(n_rows if args else 40_000_000, workdir)
        return
    if "--mor-steady" in sys.argv:
        # positional arg = base-table KEYS; 40M default (VERDICT r8 #5)
        mor_steady_probe(n_rows if args else 40_000_000, workdir)
        return
    if "--mor" in sys.argv:
        mor_probe(n_rows, workdir)
        return
    shutil.rmtree(workdir, ignore_errors=True)

    spark = make_session(app_name="throughput-probe")
    cfg = wide_events_config()
    wh = ParquetWarehouse(spark, os.path.join(workdir, "wh"))
    table = "events_zstd_l06"
    # --sorted: WRITE ORDERED BY row_1 (reference README.md:85-86 sorted_by)
    # -> compaction produces disjoint per-file ts ranges -> range predicates
    # skip whole files via parquet stats
    wh.create_table(
        cfg.schema, table, "zstd", 6, sort_order=["row_1"] if sorted_by_ts else None
    )

    plan = LoadPlan(
        total_rows=n_rows,
        batch_rows=max(250_000, n_rows // 8),
        concurrency=4,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        compact_after_load=False,
        partitions_per_batch=32,
        progress=False,
    )
    t0 = time.perf_counter()
    load_table(spark, wh, cfg, table, plan)
    load_s = time.perf_counter() - t0
    # baseline storage numbers are post-compaction (bench.ts:234-239)
    t0 = time.perf_counter()
    wh.optimize(cfg.schema, table, target_file_size_bytes=512 * 1024 * 1024)
    optimize_s = time.perf_counter() - t0
    size = measure_sizes(wh, cfg.schema, table, "zstd", 6)

    df = wh.read(cfg.schema, table)
    # flagship conjunct order = codegen evaluation order (short-circuit):
    # cheap int/ts comparisons first so the expensive substring scan runs
    # only on survivors (~45%) — Trino's optimizer reorders this itself,
    # Catalyst doesn't (measured +28%: 34.0 -> 43.5 M rows/s at 10M)
    shapes = _baseline_shapes()
    def run_shapes(d):
        out = {}
        for name, fn in shapes.items():
            best, rows = float("inf"), 0
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(d)
                best = min(best, time.perf_counter() - t0)
            out[name] = {
                "sec": round(best, 3),
                "rows": rows,
                "mrows_per_s": round(n_rows / best / 1e6, 1),
            }
        return out

    results = run_shapes(df)

    report = {
        "n_rows": n_rows,
        "sorted_by_ts": sorted_by_ts,
        "load_sec": round(load_s, 1),
        "load_krows_per_s": round(n_rows / load_s / 1e3, 1),
        "optimize_sec": round(optimize_s, 1),
        "data_bytes": size.data_bytes,
        "bytes_per_row": size.bytes_per_row,
        "queries": results,
    }

    if percol:
        from hands_on_iceberg_compression_spark.sources.warehouse import (
            string_column_overrides,
        )

        if "--advise" in sys.argv:
            # measured per-column choice (codec_advisor) instead of the
            # static strings->zstd-1 heuristic
            from hands_on_iceberg_compression_spark.pipeline.codec_advisor import (
                advise,
                overrides_from_advice,
            )

            overrides = overrides_from_advice(advise(df), ("zstd", 6))
        else:
            overrides = string_column_overrides(df, "zstd", 1)
        t0 = time.perf_counter()
        wh.rewrite_per_column_codec(cfg.schema, table, overrides, max_workers=16)
        rewrite_s = time.perf_counter() - t0
        size2 = measure_sizes(wh, cfg.schema, table, "zstd", 6)
        report["percol"] = {
            "string_cols": len(overrides),
            "rewrite_sec": round(rewrite_s, 1),
            "data_bytes": size2.data_bytes,
            "bytes_per_row": size2.bytes_per_row,
            "bytes_delta_pct": round(
                100 * (size2.data_bytes - size.data_bytes) / size.data_bytes, 2
            ),
            "queries": run_shapes(wh.read(cfg.schema, table)),
        }

    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
