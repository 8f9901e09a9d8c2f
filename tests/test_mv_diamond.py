"""DIAMOND MV topology (VERDICT r17 #5): one feeder -> two sibling
keep-latest MVs (column-pruned via ``value_cols``, r18) -> a JOIN MV of
the siblings.  What the linear chain nets cannot exercise: TWO
independent per-edge watermarks over the SAME upstream commits
converging at a join, under skewed tick orders (one sibling far ahead).

The contract under test (incremental_mv module docstring): any tick
order is consistent — the join MV only ever joins COMMITTED sibling
states, so at every instant it equals keep_latest(mva) JOIN
keep_latest(mvb); after a topological drain it equals the END-TO-END
truth recomputed from the feeder.  Randomized DML + crashes at all
three stages + checkpoint rewinds/losses at all four edges must
converge on drain, with the delete-stack auto-fold policy live on the
sibling ticks.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from hands_on_iceberg_compression_spark.operators.dedup import keep_latest
from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
    maintain_join_mv,
    maintain_keep_latest_mv,
)
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

SCHEMA = "k int, ts int, eid int, a int, b int"
POL = {"max_pending_delete_entries": 2}


def _mk(spark, tmp_path, name):
    wh = ParquetWarehouse(spark, str(tmp_path / name))
    for t in ("src", "mva", "mvb", "mvj"):
        wh.create_table("lab", t, "zstd", 1, properties={"snapshots": "true"})
    return wh


def _tick_a(wh, ck, policy=None):
    return maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mva"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
        value_cols=["a"], maintenance_policy=policy,
    )


def _tick_b(wh, ck, policy=None):
    return maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mvb"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
        value_cols=["b"], maintenance_policy=policy,
    )


def _tick_j(wh, ckl, ckr):
    return maintain_join_mv(
        wh, ("lab", "mva"), ("lab", "mvb"), ("lab", "mvj"), ["k"],
        ts_col="ts", tie_col="eid",
        checkpoint_left=ckl, checkpoint_right=ckr,
    )


def _mvj_rows(wh):
    return sorted(
        (r["k"], r["a"], r["b"]) for r in wh.read("lab", "mvj").collect()
    )


def _expected_end_to_end(wh):
    """The diamond's truth recomputed from the FEEDER: both siblings
    carry every surviving key, so the inner join is exactly
    keep_latest(src) projected to (k, a, b)."""
    if wh.is_empty("lab", "src"):
        return []
    return sorted(
        (r["k"], r["a"], r["b"])
        for r in keep_latest(
            wh.read("lab", "src"), ["k"], "ts", "eid"
        ).collect()
    )


def _expected_from_siblings(wh):
    """The per-edge consistency truth: whatever the siblings have
    COMMITTED, joined — what the join MV must equal at EVERY instant,
    however skewed the tick order."""
    a = wh.read("lab", "mva").select("k", "a")
    b = wh.read("lab", "mvb").select("k", "b")
    return sorted(
        (r["k"], r["a"], r["b"]) for r in a.join(b, ["k"]).collect()
    )


def _seed(wh, spark):
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(k, 0, k, k * 10, k * 100) for k in range(6)], SCHEMA
        ),
        batch_id="seed",
    )


def _drain(wh, cka, ckb, ckl, ckr):
    _tick_a(wh, cka, policy=POL)
    _tick_b(wh, ckb, policy=POL)
    _tick_j(wh, ckl, ckr)


def test_diamond_skewed_tick_orders(spark, tmp_path):
    """Scripted skew: sibling A races ahead (several DML + A-ticks)
    while B never ticks — the join MV must stay CONSISTENT (fresh a,
    stale b, both committed states) at every step, and a drain lands
    the end-to-end truth."""
    wh = _mk(spark, tmp_path, "skew")
    d = tmp_path / "skew"
    cka, ckb = str(d / "cka.json"), str(d / "ckb.json")
    ckl, ckr = str(d / "ckl.json"), str(d / "ckr.json")
    _seed(wh, spark)
    _drain(wh, cka, ckb, ckl, ckr)
    assert _mvj_rows(wh) == _expected_end_to_end(wh)

    # A far ahead: updates to BOTH value columns, but only A ticks
    for i in range(1, 4):
        wh.merge_upsert(
            "lab", "src",
            spark.createDataFrame(
                [(i, i, 100 + i, i * 11, i * 111)], SCHEMA
            ),
            ["k"], mode="merge-on-read",
        )
        _tick_a(wh, cka, policy=POL)
        _tick_j(wh, ckl, ckr)
        # consistent: fresh a-values joined to B's last committed b
        assert _mvj_rows(wh) == _expected_from_siblings(wh)
    got = {k: (a, b) for k, a, b in _mvj_rows(wh)}
    assert got[3] == (33, 300)  # a fresh, b stale — and CONSISTENT

    # a key dies while B still lags: A tombstones it, the join row must
    # vanish even though B never saw the delete
    wh.delete_where("lab", "src", "k = 2", mode="merge-on-read")
    _tick_a(wh, cka, policy=POL)
    _tick_j(wh, ckl, ckr)
    assert all(k != 2 for k, _a, _b in _mvj_rows(wh))
    assert _mvj_rows(wh) == _expected_from_siblings(wh)

    # drain: B catches up over the WHOLE accumulated window at once
    _drain(wh, cka, ckb, ckl, ckr)
    assert _mvj_rows(wh) == _expected_end_to_end(wh)
    got = {k: (a, b) for k, a, b in _mvj_rows(wh)}
    assert got[3] == (33, 333)


def _crash_stage(wh, tick):
    """Crash a stage after its first MV commit — for the join MV that
    is BETWEEN the two per-side pulls (the crash the two-checkpoint
    composition must tolerate)."""
    orig = wh.merge_upsert

    def wrapped(*args, **kw):
        orig(*args, **kw)
        raise RuntimeError("crash after MV commit")

    wh.merge_upsert = wrapped
    try:
        tick()
    except RuntimeError:
        pass
    finally:
        del wh.merge_upsert


DIAMOND_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "upsert", "mor_delete", "cow_delete", "optimize",
             "ta", "tb", "tj", "crash_a", "crash_b", "crash_j",
             "rewind", "lost"]
        ),
        st.integers(0, 11),
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=5, deadline=None)
@given(ops=DIAMOND_OPS)
def test_randomized_diamond_converges(spark, tmp_path_factory, ops):
    """The diamond under fire: randomized feeder DML, arbitrarily
    skewed/interleaved ticks at all three stages, crashes mid-tick
    (including between the join MV's two pulls), checkpoint
    rewinds/losses at all four edges, auto-fold policy live on the
    sibling ticks — the drain must land the end-to-end truth."""
    wh = _mk(spark, tmp_path_factory.mktemp("dia"), "d")
    d = str(tmp_path_factory.mktemp("dia_ck"))
    cka, ckb = f"{d}/cka.json", f"{d}/ckb.json"
    ckl, ckr = f"{d}/ckl.json", f"{d}/ckr.json"
    cks = [cka, ckb, ckl, ckr]
    _seed(wh, spark)
    _drain(wh, cka, ckb, ckl, ckr)
    eid = 1000
    for op, pick in ops:
        eid += 1
        if op == "append":
            wh.append(
                "lab", "src",
                spark.createDataFrame(
                    [(50 + eid % 5, eid, eid, pick, pick * 3)], SCHEMA
                ),
                batch_id=f"a{eid}",
            )
        elif op == "upsert":
            wh.merge_upsert(
                "lab", "src",
                spark.createDataFrame(
                    [(pick % 8, eid, eid, pick * 7, pick * 13)], SCHEMA
                ),
                ["k"], mode="merge-on-read",
            )
        elif op == "mor_delete":
            wh.delete_where(
                "lab", "src", f"k = {pick % 8}", mode="merge-on-read"
            )
        elif op == "cow_delete":
            wh.delete_where("lab", "src", f"k = {pick % 8}")
        elif op == "optimize":
            wh.optimize("lab", ["src", "mva", "mvb"][pick % 3])
        elif op == "ta":
            _tick_a(wh, cka, policy=POL)
        elif op == "tb":
            _tick_b(wh, ckb, policy=POL)
        elif op == "tj":
            _tick_j(wh, ckl, ckr)
        elif op == "crash_a":
            _crash_stage(wh, lambda: _tick_a(wh, cka, policy=POL))
        elif op == "crash_b":
            _crash_stage(wh, lambda: _tick_b(wh, ckb, policy=POL))
        elif op == "crash_j":
            _crash_stage(wh, lambda: _tick_j(wh, ckl, ckr))
        elif op == "rewind":
            ck = cks[pick % 4]
            if os.path.exists(ck):
                with open(ck) as f:
                    stt = json.load(f)
                stt["version"] = max(1, stt["version"] - (pick % 3 + 1))
                with open(ck, "w") as f:
                    json.dump(stt, f)
        else:  # lost
            ck = cks[pick % 4]
            if os.path.exists(ck):
                os.unlink(ck)
    _drain(wh, cka, ckb, ckl, ckr)
    assert _mvj_rows(wh) == _expected_end_to_end(wh)
    # the siblings themselves converged to their projections
    assert sorted(
        (r["k"], r["a"]) for r in wh.read("lab", "mva").collect()
    ) == sorted((k, a) for k, a, _b in _expected_end_to_end(wh))
    assert sorted(wh.read("lab", "mva").columns) == ["a", "eid", "k", "ts"]


def test_value_cols_duplicate_names_refuse(spark, tmp_path):
    """r18 second-pass pin: a repeated name in any selection list would
    produce duplicate MV columns deep inside a tick — all three
    selection params refuse up front."""
    import pytest

    from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
        maintain_topn_mv,
    )

    wh = _mk(spark, tmp_path, "dupsel")
    _seed(wh, spark)
    ck = str(tmp_path / "dupsel" / "ck.json")
    # the join MV resolves both sides' columns before validating the
    # selection, so the siblings need a commit first
    _tick_a(wh, str(tmp_path / "dupsel" / "cka.json"))
    _tick_b(wh, str(tmp_path / "dupsel" / "ckb.json"))
    with pytest.raises(ValueError, match="duplicates"):
        maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", "mva"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck,
            value_cols=["a", "a"],
        )
    with pytest.raises(ValueError, match="duplicates"):
        maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mva"), ["k"], 2,
            order_col="a", tie_col="eid", checkpoint_file=ck,
            value_cols=["b", "b"],
        )
    with pytest.raises(ValueError, match="duplicates"):
        maintain_join_mv(
            wh, ("lab", "mva"), ("lab", "mvb"), ("lab", "mvj"), ["k"],
            ts_col="ts", tie_col="eid",
            checkpoint_left=ck, checkpoint_right=ck + "2",
            left_value_cols=["a", "a"],
        )


def test_value_cols_grown_later_starts_carrying(spark, tmp_path):
    """r18 docstring contract: source columns outside the projection
    never reach the MV — and ADDING a column to value_cols later makes
    the next tick evolve the MV and start carrying it (un-refreshed
    keys read NULL, exactly like their pre-projection source state
    under the r17 evolution semantics)."""
    wh = _mk(spark, tmp_path, "grow")
    _seed(wh, spark)
    ck = str(tmp_path / "grow" / "ck.json")
    _tick_a(wh, ck)  # value_cols=["a"] — 'b' never lands
    assert sorted(wh.read("lab", "mva").columns) == ["a", "eid", "k", "ts"]

    # churn one key, then tick with the GROWN projection
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(2, 1, 100, 22, 2222)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mva"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
        value_cols=["a", "b"],
    )
    assert sorted(wh.read("lab", "mva").columns) == [
        "a", "b", "eid", "k", "ts",
    ]
    got = {r["k"]: (r["a"], r["b"]) for r in wh.read("lab", "mva").collect()}
    assert got[2] == (22, 2222)  # refreshed key carries b
    assert got[3] == (30, None)  # un-refreshed key reads NULL
