"""Batched changelog -> MERGE INTO application (VERDICT r12 #4 / r13 #3):
``merge_into_batched`` accumulates source CDC windows and fires ONE
conditional merge_into per accumulated batch — the designed mitigation
for the measured ~5.3x per-tick discovery tax.  Pinned here:

- accumulation gating: polls below max_lag_commits/min_batch_rows issue
  NO merge, NO changelog read, and NO target commit;
- convergence: after a fire the target mirrors the source's keyed state
  exactly, whatever mix of upserts/deletes the window accumulated;
- at-least-once: a redelivered (crash-rewound) accumulated window is a
  no-op — freshness conditions make re-application idempotent;
- the rows-estimate trigger fires early under bursts.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hands_on_iceberg_compression_spark.pipeline.cdc_apply import (
    merge_into_batched,
    pending_rows_estimate,
)
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

SCHEMA = "k int, ts int, event_id int, v int"


def _mk(spark, tmp_path, name):
    wh = ParquetWarehouse(spark, str(tmp_path / name))
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    wh.create_table("lab", "tgt", "zstd", 1, properties={"snapshots": "true"})
    return wh


def _rows(wh, table):
    return sorted(
        (r["k"], r["ts"], r["event_id"], r["v"])
        for r in wh.read("lab", table).collect()
    )


def _seed_and_bootstrap(wh, spark, ckpt):
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(1, 0, 1, 10), (2, 0, 2, 20), (3, 0, 3, 30)], SCHEMA
        ),
        batch_id="seed",
    )
    out = merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt
    )
    assert out.get("bootstrapped") and not out["fired"]
    # consume-from-now contract: seed the target at the source's head
    wh.append("lab", "tgt", wh.read("lab", "src"), batch_id="mirror_seed")
    assert _rows(wh, "tgt") == _rows(wh, "src")


def _poll(wh, ckpt, **kw):
    return merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt, **kw
    )


def test_accumulation_gating_and_convergence(spark, tmp_path):
    wh = _mk(spark, tmp_path, "acc")
    ckpt = str(tmp_path / "acc" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    tgt_head0 = wh._latest_version("lab", "tgt")

    # epoch 1: upsert (update k=1, insert k=4)
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(1, 1, 4, 11), (4, 1, 5, 40)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    # below the lag threshold: NO fire, NO changelog read, NO target commit
    real_rc = wh.read_changes
    wh.read_changes = lambda *a, **k: pytest.fail(
        "non-firing poll must not read the changelog"
    )
    try:
        out = _poll(wh, ckpt, max_lag_commits=2)
    finally:
        wh.read_changes = real_rc
    assert out["fired"] is False and out["lag_commits"] == 1
    assert wh._latest_version("lab", "tgt") == tgt_head0

    # epoch 2: delete k=2, update k=3 — threshold hit, ONE merge applies
    # BOTH epochs
    wh.delete_where("lab", "src", "k = 2", mode="merge-on-read")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(3, 2, 6, 31)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    out = _poll(wh, ckpt, max_lag_commits=2)
    assert out["fired"] is True
    assert _rows(wh, "tgt") == _rows(wh, "src")
    assert all(r[0] != 2 for r in _rows(wh, "tgt"))  # tombstone landed
    assert (1, 1, 4, 11) in _rows(wh, "tgt")  # epoch-1 update landed
    assert (3, 2, 6, 31) in _rows(wh, "tgt")  # epoch-2 update landed

    # in-window churn: a key inserted AND deleted nets to nothing; a key
    # deleted AND re-inserted lands as its final state, never a tombstone
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(9, 3, 7, 90)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    wh.delete_where("lab", "src", "k = 9", mode="merge-on-read")
    wh.delete_where("lab", "src", "k = 4", mode="merge-on-read")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(4, 4, 8, 44)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    out = _poll(wh, ckpt, max_lag_commits=2)
    assert out["fired"] is True
    assert _rows(wh, "tgt") == _rows(wh, "src")
    assert (4, 4, 8, 44) in _rows(wh, "tgt")
    assert all(r[0] != 9 for r in _rows(wh, "tgt"))


def test_redelivered_accumulated_window_is_noop(spark, tmp_path):
    """Crash between the merge and the checkpoint write redelivers the
    whole ACCUMULATED window — the strict freshness guard and the
    key-gone tombstone path must make re-application a no-op (this is
    the at-least-once contract the batching knob must not break)."""
    wh = _mk(spark, tmp_path, "rd")
    ckpt = str(tmp_path / "rd" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(1, 1, 4, 11), (5, 1, 5, 50)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    wh.delete_where("lab", "src", "k = 3", mode="merge-on-read")
    with open(ckpt) as f:
        pre = json.load(f)
    out = _poll(wh, ckpt, max_lag_commits=1)
    assert out["fired"] and _rows(wh, "tgt") == _rows(wh, "src")
    want = _rows(wh, "tgt")
    tgt_head = wh._latest_version("lab", "tgt")
    # simulate the crash: rewind the checkpoint to before the window
    with open(ckpt, "w") as f:
        json.dump(pre, f)
    out = _poll(wh, ckpt, max_lag_commits=1)
    assert out["fired"]  # window consumed again
    assert _rows(wh, "tgt") == want  # and applied as a pure no-op
    # no-op REAPPLICATION must not have rewritten rows: merge_upsert's
    # zero-work short-circuit means no new target commit
    assert wh._latest_version("lab", "tgt") == tgt_head
    # wider redelivered window: old rows no-op, the new commit lands
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(5, 2, 6, 51)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    with open(ckpt, "w") as f:
        json.dump(pre, f)
    _poll(wh, ckpt, max_lag_commits=1)
    assert _rows(wh, "tgt") == _rows(wh, "src")
    assert (5, 2, 6, 51) in _rows(wh, "tgt")


def test_head_below_checkpoint_raises(spark, tmp_path):
    """ADVICE r14: a source head BELOW the checkpoint (stale ref or a
    recreated table) must raise — the silent shape returned
    {fired: False, lag_commits: 0} forever, reporting "in sync" while
    the mirror diverged.  consume_changes already raises here; the
    batched poll must surface the same error, not mask it."""
    wh = _mk(spark, tmp_path, "hb")
    ckpt = str(tmp_path / "hb" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    with open(ckpt) as f:
        state = json.load(f)
    state["version"] = state["version"] + 5  # recreated-table shape
    with open(ckpt, "w") as f:
        json.dump(state, f)
    with pytest.raises(ValueError, match="BELOW the checkpointed"):
        _poll(wh, ckpt, max_lag_commits=100)


def test_min_batch_rows_fires_early_and_estimate_tracks(spark, tmp_path):
    wh = _mk(spark, tmp_path, "mb")
    ckpt = str(tmp_path / "mb" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    v0 = wh._latest_version("lab", "src")
    # small epoch: below both gates
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(1, 1, 4, 11)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    out = _poll(wh, ckpt, max_lag_commits=100, min_batch_rows=50)
    assert out["fired"] is False and out["pending_rows_est"] >= 1
    # burst: 60 rows in one commit — rows gate fires despite tiny lag
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame(
            [(100 + i, 1, 100 + i, i) for i in range(60)], SCHEMA
        ),
        ["k"], mode="merge-on-read",
    )
    est = pending_rows_estimate(
        wh, "lab", "src", v0, wh._latest_version("lab", "src")
    )
    assert est >= 60
    out = _poll(wh, ckpt, max_lag_commits=100, min_batch_rows=50)
    assert out["fired"] is True
    assert _rows(wh, "tgt") == _rows(wh, "src")
    assert len(_rows(wh, "tgt")) == 63


DML = st.lists(
    st.tuples(
        st.sampled_from(
            ["upsert", "mor_delete", "cow_delete", "optimize",
             "poll1", "poll2", "poll4"]
        ),
        st.integers(0, 9),
    ),
    min_size=3,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(ops=DML)
def test_randomized_dml_mirror_converges(spark, tmp_path_factory, ops):
    """Randomized interleaving of source DML with batched polls at
    MIXED window sizes (the poll cadence a real deployment would have:
    sometimes the gate fires, sometimes it accumulates), then a drain —
    the mirror must equal the source exactly whatever history ran."""
    wh = _mk(spark, tmp_path_factory.mktemp("cdcrand"), "r")
    ckpt = str(tmp_path_factory.mktemp("cdcrand") / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(k, 0, k, k * 10) for k in range(5)], SCHEMA),
        batch_id="seed",
    )
    _poll(wh, ckpt)  # bootstrap
    wh.append("lab", "tgt", wh.read("lab", "src"), batch_id="mirror_seed")
    eid = 0
    for op, pick in ops:
        eid += 1
        if op == "upsert":
            wh.merge_upsert(
                "lab", "src",
                spark.createDataFrame(
                    [(pick % 7, eid, eid + 100, pick)], SCHEMA
                ),
                ["k"], mode="merge-on-read",
            )
        elif op == "mor_delete":
            wh.delete_where(
                "lab", "src", f"k = {pick % 7}", mode="merge-on-read"
            )
        elif op == "cow_delete":
            wh.delete_where("lab", "src", f"event_id = {pick}")
        elif op == "optimize":
            wh.optimize("lab", "src")
        else:
            _poll(wh, ckpt, max_lag_commits=int(op[-1]))
    # drain, then exact mirror equality
    _poll(wh, ckpt, max_lag_commits=1)
    assert _rows(wh, "tgt") == _rows(wh, "src")

def test_branch_refs_apply_loop(spark, tmp_path):
    """r17 (VERDICT r16 #6): the batched apply loop runs on branch refs
    — the staging workflow.  Source polls/pulls/re-derives resolve on
    ``src_branch``, the MERGE commits to ``tgt_branch``, MAIN on both
    tables stays untouched, and a cross-ref pull refuses through the
    checkpoint's recorded ref."""
    wh = _mk(spark, tmp_path, "brc")
    ckpt = str(tmp_path / "brc" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(1, 0, 1, 10), (2, 0, 2, 20)], SCHEMA
        ),
        batch_id="seed",
    )
    wh.create_branch("lab", "src", "stage")
    # mirror-seed the target at the branch state, then fork its branch
    wh.append(
        "lab", "tgt", wh.read("lab", "src", "stage"), batch_id="mseed"
    )
    wh.create_branch("lab", "tgt", "tstage")
    out = merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt,
        src_branch="stage", tgt_branch="tstage",
    )
    assert out.get("bootstrapped") and not out["fired"]
    src_main_v = wh._latest_version("lab", "src")
    tgt_main_v = wh._latest_version("lab", "tgt")

    # MAIN-only churn must never reach the staged mirror
    wh.append(
        "lab", "src",
        spark.createDataFrame([(7, 1, 7, 70)], SCHEMA), batch_id="m1",
    )
    # branch churn: update k=1, delete k=2, insert k=5 — all on stage
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(1, 1, 4, 11), (5, 1, 5, 50)], SCHEMA),
        ["k"], mode="merge-on-read", branch="stage",
    )
    wh.delete_where(
        "lab", "src", "k = 2", mode="merge-on-read", branch="stage"
    )
    out = merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt,
        src_branch="stage", tgt_branch="tstage", max_lag_commits=1,
    )
    assert out["fired"] and out["pending_rows_est"] >= 2
    got = sorted(
        (r["k"], r["ts"], r["event_id"], r["v"])
        for r in wh.read("lab", "tgt", "tstage").collect()
    )
    want = sorted(
        (r["k"], r["ts"], r["event_id"], r["v"])
        for r in wh.read("lab", "src", "stage").collect()
    )
    assert got == want
    assert all(k != 7 for k, *_ in got)  # main-only row never staged
    # neither table's MAIN moved (src main moved by OUR append only)
    assert wh._latest_version("lab", "tgt") == tgt_main_v
    assert wh._latest_version("lab", "src") == src_main_v + 1

    # cross-ref pull refuses via the checkpoint's recorded ref
    with pytest.raises(ValueError, match="tracks ref"):
        merge_into_batched(
            wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt,
        )

def test_mirror_evolves_with_source(spark, tmp_path):
    """r17: a source add_column propagates into the MIRROR on the next
    fire (merge_into drops extra source columns by design, so without
    the maintainer-level evolution the new column silently never
    lands); evolve_schema=False refuses loudly."""
    wh = _mk(spark, tmp_path, "evm")
    ckpt = str(tmp_path / "evm" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    wh.add_column("lab", "src", "extra", "string")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame(
            [(1, 1, 9, 11, "x")], SCHEMA + ", extra string"
        ),
        ["k"], mode="merge-on-read",
    )
    with pytest.raises(ValueError, match="silently drop"):
        _poll(wh, ckpt, max_lag_commits=1, evolve_schema=False)
    assert "extra" not in wh.read("lab", "tgt").columns
    out = _poll(wh, ckpt, max_lag_commits=1)
    assert out["fired"]
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in wh.read("lab", "tgt").collect()
    }
    assert got[1] == (11, "x")
    assert got[2] == (20, None) and got[3] == (30, None)

def test_branch_mirror_evolves(spark, tmp_path):
    """r17 composition: source evolution on a STAGE branch propagates
    into a BRANCH target — add_column lands on tgt_branch, main's
    schema on both tables untouched."""
    wh = _mk(spark, tmp_path, "brev")
    ckpt = str(tmp_path / "brev" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 0, 1, 10)], SCHEMA), batch_id="seed",
    )
    wh.create_branch("lab", "src", "stage")
    wh.append(
        "lab", "tgt", wh.read("lab", "src", "stage"), batch_id="mseed"
    )
    wh.create_branch("lab", "tgt", "tstage")
    merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt,
        src_branch="stage", tgt_branch="tstage",
    )
    wh.add_column("lab", "src", "extra", "string", branch="stage")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame(
            [(1, 1, 2, 11, "x")], SCHEMA + ", extra string"
        ),
        ["k"], mode="merge-on-read", branch="stage",
    )
    out = merge_into_batched(
        wh, ("lab", "src"), ("lab", "tgt"), ["k"], ckpt,
        src_branch="stage", tgt_branch="tstage", max_lag_commits=1,
    )
    assert out["fired"]
    got = {
        r["k"]: r["extra"]
        for r in wh.read("lab", "tgt", "tstage").collect()
    }
    assert got == {1: "x"}
    # MAIN schemas untouched on both tables
    assert "extra" not in {
        f["name"] for f in wh.table_schema("lab", "src")
    }
    assert "extra" not in {
        f["name"] for f in wh.table_schema("lab", "tgt")
    }

def test_cli_mv_tick_cdc_apply(spark, tmp_path, capsys):
    """mv-tick kind=cdc-apply: the batched MERGE mirror driven from
    the CLI — a non-firing poll and a firing one, JSON results
    asserted."""
    import json as _json

    from hands_on_iceberg_compression_spark.__main__ import main as cli_main

    wh = _mk(spark, tmp_path, "clic")
    ckpt = str(tmp_path / "clic" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame([(1, 1, 4, 11)], SCHEMA),
        ["k"], mode="merge-on-read",
    )
    rc = cli_main([
        "mv-tick", "--warehouse", wh.root, "--kind", "cdc-apply",
        "--src", "lab.src", "--mv", "lab.tgt", "--keys", "k",
        "--checkpoint", ckpt, "--max-lag-commits", "5",
        "--min-batch-rows", "100",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["fired"] is False and out["lag_commits"] == 1
    rc = cli_main([
        "mv-tick", "--warehouse", wh.root, "--kind", "cdc-apply",
        "--src", "lab.src", "--mv", "lab.tgt", "--keys", "k",
        "--checkpoint", ckpt,
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["fired"] is True
    assert _rows(wh, "tgt") == _rows(wh, "src")


def test_auto_fold_bounds_mirror_delete_stack(spark, tmp_path):
    """VERDICT r17 #1, cdc-apply edition: maintenance_policy folds the
    TARGET mirror's pending MoR delete stack from the poll path —
    fired merges stack entries, the over-threshold poll ends with an
    optimize() that clears them, and mirror state stays exact across
    the fold (redelivery/freshness semantics untouched)."""
    wh = _mk(spark, tmp_path, "afold")
    ckpt = str(tmp_path / "afold" / "ck.json")
    _seed_and_bootstrap(wh, spark, ckpt)
    pol = {"max_pending_delete_entries": 3}
    folded = None
    for i in range(1, 8):
        wh.merge_upsert(
            "lab", "src",
            spark.createDataFrame([(i % 4, i, 100 + i, i * 7)], SCHEMA),
            ["k"], mode="merge-on-read",
        )
        out = _poll(wh, ckpt, maintenance_policy=pol)
        assert out["fired"]
        st = wh.pending_delete_stats("lab", "tgt")
        if "auto_fold" in out:
            folded = out["auto_fold"]
            assert folded["pending_delete_entries"] > 3
            assert st == {"entries": 0, "rows": 0}
        assert _rows(wh, "tgt") == _rows(wh, "src")
    assert folded is not None, "the policy never fired"
    # a NON-firing poll past threshold still folds (a past fire left
    # the stack over; the census itself is zero-job head metadata)
    out = _poll(wh, ckpt, max_lag_commits=99, maintenance_policy=pol)
    assert not out["fired"] and "auto_fold" not in out
