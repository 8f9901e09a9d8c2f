"""MV-over-MV chaining (VERDICT r16 #1): a maintainer's SOURCE may be
another maintained MV — the dataflow DAG a real pipeline builds
(keep-latest -> agg rollup, keep-latest -> top-N).  Pinned here:

- maintainer commit shapes feed the downstream changelog correctly:
  MoR ticks emit O(batch) row-exact windows, CoW ticks emit rewrite
  pairs that cancel in aggregate algebra — BOTH upstream modes converge;
- the tick-ordering contract (incremental_mv module docstring): any
  tick order is consistent, downstream-first is stale-but-consistent,
  a topological drain is exact;
- watermarks compose per edge: stage-2's applied watermark keys on
  stage-1's commit versions while stage-1's checkpoint keys on the
  source's — redelivery at either edge is a no-op;
- randomized DML + crashes before/after the MV commit at BOTH stages +
  checkpoint rewinds/losses at both stages all converge on drain.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators.dedup import keep_latest
from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
    maintain_agg_mv,
    maintain_keep_latest_mv,
    maintain_topn_mv,
)
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

SCHEMA = "k int, grp int, ts int, eid int, v int"


def _mk(spark, tmp_path, name):
    wh = ParquetWarehouse(spark, str(tmp_path / name))
    for t in ("src", "mv1", "mv2"):
        wh.create_table("lab", t, "zstd", 1, properties={"snapshots": "true"})
    return wh


def _tick1(wh, ckpt, mode="merge-on-read", policy=None):
    """Stage 1: keep-latest MV over the source."""
    return maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv1"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ckpt, mode=mode,
        maintenance_policy=policy,
    )


def _tick2(wh, ckpt):
    """Stage 2: aggregate rollup over the keep-latest MV."""
    return maintain_agg_mv(
        wh, ("lab", "mv1"), ("lab", "mv2"), ["grp"], sum_cols=["v"],
        checkpoint_file=ckpt,
    )


def _mv1_rows(wh):
    return sorted(
        (r["k"], r["grp"], r["ts"], r["eid"], r["v"])
        for r in wh.read("lab", "mv1").collect()
    )


def _mv2_rows(wh):
    return sorted(
        (r["grp"], r["cnt"], r["sum_v"], r["nn_v"], r["avg_v"])
        for r in wh.read("lab", "mv2").collect()
    )


def _expected_mv1(wh):
    if wh.is_empty("lab", "src"):
        return []
    return sorted(
        (r["k"], r["grp"], r["ts"], r["eid"], r["v"])
        for r in keep_latest(
            wh.read("lab", "src"), ["k"], "ts", "eid"
        ).collect()
    )


def _expected_mv2(wh):
    """The chain's END-TO-END truth: the rollup recomputed from the
    SOURCE, through the same keep-latest definition and the same
    aggregate expressions maintain_agg_mv commits."""
    if wh.is_empty("lab", "src"):
        return []
    latest = keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid")
    agg = latest.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(F.coalesce(F.col("v"), F.lit(0))).alias("sum_v"),
        F.sum(
            F.when(F.col("v").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("nn_v"),
    ).withColumn(
        "avg_v",
        F.when(
            F.col("nn_v") > 0, F.col("sum_v") / F.col("nn_v")
        ).cast("double"),
    )
    return sorted(
        (r["grp"], r["cnt"], r["sum_v"], r["nn_v"], r["avg_v"])
        for r in agg.collect()
    )


def _seed(wh, spark):
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(k, k % 3, 0, k, k * 10) for k in range(9)], SCHEMA
        ),
        batch_id="seed",
    )


@pytest.mark.parametrize("mv1_mode", ["merge-on-read", "copy-on-write"])
def test_chain_keep_latest_to_agg_converges(spark, tmp_path, mv1_mode):
    """Scripted chain lifecycle under BOTH upstream tick modes: MoR
    commits feed O(batch) windows; CoW commits feed full rewrite-pair
    windows whose unchanged rows cancel in the agg — both exact."""
    wh = _mk(spark, tmp_path, f"ch_{mv1_mode[:3]}")
    ck1 = str(tmp_path / f"ch_{mv1_mode[:3]}" / "ck1.json")
    ck2 = str(tmp_path / f"ch_{mv1_mode[:3]}" / "ck2.json")
    _seed(wh, spark)
    _tick1(wh, ck1, mode=mv1_mode)
    _tick2(wh, ck2)
    assert _mv1_rows(wh) == _expected_mv1(wh)
    assert _mv2_rows(wh) == _expected_mv2(wh)

    # a key MOVES groups (k=4: grp 1 -> 2): the upstream update must
    # land downstream as -1 from the old group AND +1 to the new one
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(4, 2, 1, 100, 41)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    # a key dies (CoW delete) and a new key lands in a fresh group
    wh.delete_where("lab", "src", "k = 7")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(20, 5, 1, 101, 200)], SCHEMA),
        batch_id="b1",
    )
    _tick1(wh, ck1, mode=mv1_mode)
    _tick2(wh, ck2)
    assert _mv1_rows(wh) == _expected_mv1(wh)
    assert _mv2_rows(wh) == _expected_mv2(wh)
    got = {g: (c, s) for g, c, s, *_ in _mv2_rows(wh)}
    assert got[5] == (1, 200)  # fresh group materialized
    assert got[1] == (1, 10)  # k=4 moved out, k=7 died: only k=1 left
    assert got[2] == (4, 191)  # k=4 (now v=41) moved in: 2,5,8,4

    # a group EMPTIES: its downstream row must tombstone (cnt==0 path)
    wh.delete_where("lab", "src", "grp = 5", mode="merge-on-read")
    _tick1(wh, ck1, mode=mv1_mode)
    _tick2(wh, ck2)
    assert _mv2_rows(wh) == _expected_mv2(wh)
    assert all(g != 5 for g, *_ in _mv2_rows(wh))


def test_tick_order_and_redelivery(spark, tmp_path):
    """The ordering contract: downstream-before-upstream is STALE BUT
    CONSISTENT (it sees only committed upstream state), the topological
    drain is exact, and redelivery at either edge is a no-op."""
    wh = _mk(spark, tmp_path, "ord")
    ck1 = str(tmp_path / "ord" / "ck1.json")
    ck2 = str(tmp_path / "ord" / "ck2.json")
    _seed(wh, spark)
    _tick1(wh, ck1)
    _tick2(wh, ck2)
    frozen = _mv2_rows(wh)

    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(0, 0, 5, 500, 999)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    # downstream FIRST: mv1 hasn't ticked, so mv2 must not move — and
    # must still equal a consistent (the previous) chain state
    out = _tick2(wh, ck2)
    assert out["groups_refreshed"] == 0
    assert _mv2_rows(wh) == frozen
    # drain in topological order -> exact
    _tick1(wh, ck1)
    _tick2(wh, ck2)
    assert _mv2_rows(wh) == _expected_mv2(wh)
    want = _mv2_rows(wh)
    mv2_head = wh._latest_version("lab", "mv2")

    # redelivery at the DOWNSTREAM edge: rewind ck2 — the applied
    # watermark filters the whole window, no new commit
    with open(ck2) as f:
        st2 = json.load(f)
    st2["version"] = max(1, st2["version"] - 2)
    with open(ck2, "w") as f:
        json.dump(st2, f)
    _tick2(wh, ck2)
    assert _mv2_rows(wh) == want
    assert wh._latest_version("lab", "mv2") == mv2_head

    # redelivery at the UPSTREAM edge: rewind ck1 — the keep-latest
    # refresh re-lands identical rows; the agg window's pairs cancel
    with open(ck1) as f:
        st1 = json.load(f)
    st1["version"] = max(1, st1["version"] - 2)
    with open(ck1, "w") as f:
        json.dump(st1, f)
    _tick1(wh, ck1)
    _tick2(wh, ck2)
    assert _mv2_rows(wh) == want == _expected_mv2(wh)


def test_chain_keep_latest_to_topn(spark, tmp_path):
    """Second chain shape: keep-latest -> top-N-per-group, driven by
    the keys-only superset changelog over the UPSTREAM MV's commits."""
    wh = _mk(spark, tmp_path, "ctn")
    wh.create_table("lab", "mv2b", "zstd", 1, properties={"snapshots": "true"})
    ck1 = str(tmp_path / "ctn" / "ck1.json")
    ck2 = str(tmp_path / "ctn" / "ck2.json")
    _seed(wh, spark)
    _tick1(wh, ck1)

    def tick_topn():
        return maintain_topn_mv(
            wh, ("lab", "mv1"), ("lab", "mv2b"), ["grp"], 2,
            order_col="v", tie_col="k", checkpoint_file=ck2,
        )

    def expected_topn():
        from pyspark.sql.window import Window

        w = Window.partitionBy("grp").orderBy(
            F.col("v").desc_nulls_last(), F.col("k").desc_nulls_last()
        )
        df = (
            keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 2)
        )
        return sorted(
            (r["grp"], r["rk"], r["k"], r["v"]) for r in df.collect()
        )

    tick_topn()
    got = sorted(
        (r["grp"], r["rk"], r["k"], r["v"])
        for r in wh.read("lab", "mv2b").collect()
    )
    assert got == expected_topn()

    # churn that PROMOTES an unmentioned upstream row: delete the top
    # doc of grp 0 (k=6, v=60) — k=3 must be promoted into the top-2
    wh.delete_where("lab", "src", "k = 6", mode="merge-on-read")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(21, 0, 1, 300, 5)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    _tick1(wh, ck1)
    tick_topn()
    got = sorted(
        (r["grp"], r["rk"], r["k"], r["v"])
        for r in wh.read("lab", "mv2b").collect()
    )
    assert got == expected_topn()


def _crash_stage(wh, tick, after_commit):
    """Crash a stage's tick before or after its MV commit (the same
    injector as the per-maintainer crash nets — chains must not change
    the per-edge reasoning)."""
    orig = wh.merge_upsert

    def wrapped(*a, **kw):
        if not after_commit:
            raise RuntimeError("crash before MV commit")
        orig(*a, **kw)
        raise RuntimeError("crash after MV commit")

    wh.merge_upsert = wrapped
    try:
        tick()
    except RuntimeError:
        pass
    finally:
        del wh.merge_upsert


CHAIN_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "upsert", "mor_delete", "cow_delete", "optimize",
             "tick1", "tick2", "crash1_b", "crash1_a", "crash2_b",
             "crash2_a", "rewind1", "rewind2", "lost1", "lost2",
             "evolve"]
        ),
        st.integers(0, 11),
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=6, deadline=None)
@given(ops=CHAIN_OPS)
def test_randomized_chain_with_crashes_converges(
    spark, tmp_path_factory, ops
):
    """The chain under fire: randomized source DML interleaved with
    out-of-order ticks, crashes before/after the MV commit at BOTH
    stages, checkpoint rewinds/losses at both edges, and SOURCE SCHEMA
    EVOLUTION (r17 — later DML carries values for every evolved
    column; the keep-latest stage must propagate the columns through
    whatever crash/redelivery state it is in) — a topological drain
    must land the exact end-to-end rollup, all columns compared."""
    wh = _mk(spark, tmp_path_factory.mktemp("chx"), "c")
    d = str(tmp_path_factory.mktemp("chx_ck"))
    ck1, ck2 = f"{d}/ck1.json", f"{d}/ck2.json"
    # the delete-stack policy rides EVERY stage-1 tick (r18, VERDICT
    # r17 #1): a tiny threshold makes auto-folds fire mid-stream under
    # crashes/rewinds/evolution — the fold must never break chain
    # convergence (its optimize commit is a changelog-skip op for mv2)
    pol = {"max_pending_delete_entries": 2}
    _seed(wh, spark)
    _tick1(wh, ck1, policy=pol)
    _tick2(wh, ck2)
    eid = 1000
    extras: list[str] = []

    def schema():
        return SCHEMA + "".join(f", {c} int" for c in extras)

    def vals(row):
        return [row + tuple(eid + i for i in range(len(extras)))]

    for op, pick in ops:
        eid += 1
        if op == "append":
            wh.append(
                "lab", "src",
                spark.createDataFrame(
                    vals((100 + eid % 7, pick % 4, eid, eid, pick * 3)),
                    schema(),
                ),
                batch_id=f"a{eid}",
            )
        elif op == "upsert":
            wh.merge_upsert(
                "lab", "src",
                spark.createDataFrame(
                    vals((pick % 12, pick % 4, eid, eid, pick * 7)),
                    schema(),
                ),
                ["k"], mode="merge-on-read",
            )
        elif op == "evolve":
            name = f"x{len(extras)}"
            wh.add_column("lab", "src", name, "int")
            extras.append(name)
        elif op == "mor_delete":
            wh.delete_where(
                "lab", "src", f"k = {pick % 12}", mode="merge-on-read"
            )
        elif op == "cow_delete":
            wh.delete_where("lab", "src", f"k = {pick % 12}")
        elif op == "optimize":
            wh.optimize("lab", "src" if pick % 2 else "mv1")
        elif op == "tick1":
            _tick1(wh, ck1, policy=pol)
        elif op == "tick2":
            _tick2(wh, ck2)
        elif op == "crash1_b":
            _crash_stage(
                wh, lambda: _tick1(wh, ck1, policy=pol), after_commit=False
            )
        elif op == "crash1_a":
            _crash_stage(
                wh, lambda: _tick1(wh, ck1, policy=pol), after_commit=True
            )
        elif op == "crash2_b":
            _crash_stage(wh, lambda: _tick2(wh, ck2), after_commit=False)
        elif op == "crash2_a":
            _crash_stage(wh, lambda: _tick2(wh, ck2), after_commit=True)
        elif op in ("rewind1", "rewind2"):
            ck = ck1 if op == "rewind1" else ck2
            if os.path.exists(ck):
                with open(ck) as f:
                    stt = json.load(f)
                stt["version"] = max(1, stt["version"] - (pick % 3 + 1))
                with open(ck, "w") as f:
                    json.dump(stt, f)
        else:  # lost1 / lost2
            ck = ck1 if op == "lost1" else ck2
            if os.path.exists(ck):
                os.unlink(ck)
    _tick1(wh, ck1, policy=pol)  # topological drain
    _tick2(wh, ck2)
    # full-width equality: every mv1 column must match the recompute.
    # An evolve with NO delivered window after it legitimately leaves
    # the MV un-evolved — but then the column holds no data anywhere
    # (reads project NULL), asserted below.
    mv1_cols = sorted(wh.read("lab", "mv1").columns)
    src_latest = keep_latest(wh.read("lab", "src"), ["k"], "ts", "eid")
    assert set(mv1_cols) <= set(src_latest.columns)

    def rows_all(df):
        # sort by k alone: unique in both frames, and evolved columns
        # hold Nones that tuple comparison cannot order
        return sorted(
            (tuple((c, r[c]) for c in mv1_cols) for r in df.collect()),
            key=lambda t: dict(t)["k"],
        )

    assert rows_all(wh.read("lab", "mv1")) == rows_all(src_latest)
    for c in set(src_latest.columns) - set(mv1_cols):
        assert (
            src_latest.filter(F.col(c).isNotNull()).count() == 0
        ), f"un-propagated column {c} holds data"
    assert _mv2_rows(wh) == _expected_mv2(wh)
