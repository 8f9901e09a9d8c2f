#!/usr/bin/env python
"""VERDICT r19 #7: commit representative .explain("formatted") dumps for the
pipeline surface — the MoR pending-delete read (_read_entries), the keyed-MV
refresh reads (touched-keys changelog pull + pruned source refresh), and the
CDC-apply batch window read — and audit them for accidental exchanges the
same way the bench queries were.

Builds a tiny throwaway warehouse (10k rows, one MoR delete batch + one eq
delete) under /tmp, captures the plans into plans/r20/pipeline_*.txt.  The
cdc_apply POLL path is zero-job by design (pending_rows_estimate from head
JSONs) — there is no plan to dump; the note in OPTIMIZATION_r20.md records
that with the code pointer.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.session import make_session
from hands_on_iceberg_compression_spark.sources.warehouse import ParquetWarehouse

WORK = "/tmp/r20_pipeline_plans"
PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r20")


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def dump(name: str, df) -> None:
    path = os.path.join(PLANS, f"pipeline_{name}.txt")
    with open(path, "w") as f:
        f.write(fmt(df))
    plan = open(path).read()
    n_ex = plan.count(") Exchange")
    n_bc = plan.count("BroadcastExchange")
    n_py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
    print(f"{name}: exchanges={n_ex} broadcasts={n_bc} python_nodes={n_py} -> {path}")


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(PLANS, exist_ok=True)
    spark = make_session(app_name="dump_pipeline_plans_r20")
    wh = ParquetWarehouse(spark, os.path.join(WORK, "wh"))
    wh.create_table("lake", "t", "zstd", 3, properties={"snapshots": "true"})

    base = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("grp"),
        F.col("id").cast("timestamp").alias("ts"),
        F.col("id").alias("tie"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    wh.append("lake", "t", base)
    v0 = wh.current_version("lake", "t")

    # one MoR position-delete batch + one eq-delete batch -> the read path
    # applies BOTH kinds
    wh.delete_where("lake", "t", "k >= 9000 AND k < 9100", mode="merge-on-read")
    wh.delete_by_keys("lake", "t", [9990, 9991, 9992], eq_cols=["k"])
    v1 = wh.current_version("lake", "t")

    # 1) MoR pending read: _read_entries with pos tuples + eq keys pending
    dump("mor_pending_read", wh.read("lake", "t"))

    # 2) keys-only changelog window pull (what both keyed MV consumers read)
    dump("touched_keys_window", wh.touched_keys("lake", "t", v0, v1, ["k"]))

    # 3) pruned source refresh read (keep-latest MV small-window path)
    dump("read_pruned_refresh", wh.read_pruned("lake", "t", {"k": [1, 2, 3, 4]}))

    # 4) CDC-apply fire path: the row-exact changes window feeding merge_into
    dump("read_changes_window", wh.read_changes("lake", "t", v0, v1, net=False))

    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
