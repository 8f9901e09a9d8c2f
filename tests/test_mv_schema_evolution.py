"""Source schema evolution THROUGH MV maintainers (r17 beyond-orders):
a source ``add_column`` used to be SILENTLY DROPPED by every keyed
maintainer — merge conformance selects only the MV's recorded columns,
so the new column never reached the MV and no error surfaced (the
data-loss direction).  ``evolve_schema=True`` (the new default)
``add_column``s the MV first (metadata-only commit, typed from the
source's recorded schema); False refuses loudly.  Convergence is exact
across the evolution boundary: un-refreshed MV keys read NULL for the
new column, and so do their source rows (written before the column
existed), so MV == keep_latest(src) still holds column-for-column.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators.dedup import keep_latest
from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
    maintain_agg_mv,
    maintain_join_mv,
    maintain_keep_latest_mv,
    maintain_topn_mv,
)
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

SCHEMA = "k int, ts int, eid int, v int"


def _mk(spark, tmp_path, name, tables=("src", "mv")):
    wh = ParquetWarehouse(spark, str(tmp_path / name))
    for t in tables:
        wh.create_table("lab", t, "zstd", 1, properties={"snapshots": "true"})
    return wh


def test_keep_latest_evolves_and_refusal(spark, tmp_path):
    wh = _mk(spark, tmp_path, "ev")
    ck = str(tmp_path / "ev" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 0, 1, 10), (2, 0, 2, 20)], SCHEMA),
        batch_id="b0",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    wh.add_column("lab", "src", "extra", "string")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(2, 1, 3, 21, "x"), (3, 1, 4, 30, "y")],
            SCHEMA + ", extra string",
        ),
        batch_id="b1",
    )
    # evolve_schema=False refuses BEFORE anything commits
    with pytest.raises(ValueError, match="silently drop"):
        maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck,
            evolve_schema=False,
        )
    assert "extra" not in wh.read("lab", "mv").columns
    # default: the MV evolves and the tick lands the new column
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in wh.read("lab", "mv").collect()
    }
    # un-refreshed key reads NULL — exactly like its pre-evolution
    # source row; refreshed keys carry values
    assert got == {1: (10, None), 2: (21, "x"), 3: (30, "y")}
    # column-for-column equality with the batch recompute
    exp = {
        r["k"]: (r["v"], r["extra"])
        for r in keep_latest(
            wh.read("lab", "src"), ["k"], "ts", "eid"
        ).collect()
    }
    assert got == exp

    # the RECONCILE path evolves too (second new column + lost ckpt)
    wh.add_column("lab", "src", "extra2", "int")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(1, 2, 5, 11, "z", 7)], SCHEMA + ", extra string, extra2 int"
        ),
        batch_id="b2",
    )
    os.unlink(ck)
    out = maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    assert out["keys_refreshed"] == -1
    got = {
        r["k"]: (r["extra"], r["extra2"])
        for r in wh.read("lab", "mv").collect()
    }
    assert got == {1: ("z", 7), 2: ("x", None), 3: ("y", None)}

    # a DROPPED source column degrades without DDL: the MV keeps the
    # column and refreshed keys fade to NULL (their batches omit it)
    wh.drop_column("lab", "src", "extra")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame(
            [(2, 3, 6, 22, 8)], SCHEMA + ", extra2 int"
        ),
        ["k"], mode="merge-on-read",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in wh.read("lab", "mv").collect()
    }
    assert got[2] == (22, None)  # refreshed: faded
    assert got[1] == (11, "z")  # untouched: stale value retained


def test_topn_evolves(spark, tmp_path):
    wh = _mk(spark, tmp_path, "evt")
    ck = str(tmp_path / "evt" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(0, d, (d + 1) * 10, "b") for d in range(4)],
            "grp int, doc_id int, score int, body string",
        ),
        batch_id="b0",
    )
    maintain_topn_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["grp"], 2,
        order_col="score", tie_col="doc_id", checkpoint_file=ck,
    )
    wh.add_column("lab", "src", "lang", "string")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(0, 9, 99, "new", "en")],
            "grp int, doc_id int, score int, body string, lang string",
        ),
        batch_id="b1",
    )
    maintain_topn_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["grp"], 2,
        order_col="score", tie_col="doc_id", checkpoint_file=ck,
    )
    got = {
        (r["grp"], r["rk"]): (r["doc_id"], r["lang"])
        for r in wh.read("lab", "mv").collect()
    }
    assert got[(0, 1)] == (9, "en") and got[(0, 2)] == (3, None)


def test_join_mv_evolves_right_side(spark, tmp_path):
    wh = _mk(spark, tmp_path, "evj", tables=("l", "r", "mv"))
    ckl = str(tmp_path / "evj" / "ckl.json")
    ckr = str(tmp_path / "evj" / "ckr.json")
    wh.append(
        "lab", "l",
        spark.createDataFrame(
            [(k, 0, k, k * 10) for k in range(3)],
            "k int, ts int, eid int, lv int",
        ),
        batch_id="seed_l",
    )
    wh.append(
        "lab", "r",
        spark.createDataFrame(
            [(k, 0, k, f"r{k}") for k in range(3)],
            "k int, ts int, eid int, rv string",
        ),
        batch_id="seed_r",
    )

    def tick():
        return maintain_join_mv(
            wh, ("lab", "l"), ("lab", "r"), ("lab", "mv"), ["k"],
            ts_col="ts", tie_col="eid",
            checkpoint_left=ckl, checkpoint_right=ckr,
        )

    tick()
    wh.add_column("lab", "r", "region", "string")
    wh.merge_upsert(
        "lab", "r",
        spark.createDataFrame(
            [(1, 1, 10, "R1", "eu")],
            "k int, ts int, eid int, rv string, region string",
        ),
        ["k"], mode="merge-on-read",
    )
    tick()
    got = {
        r["k"]: (r["rv"], r["region"])
        for r in wh.read("lab", "mv").collect()
    }
    assert got[1] == ("R1", "eu")
    assert got[0] == ("r0", None) and got[2] == ("r2", None)


def test_chain_evolution_propagates(spark, tmp_path):
    """The chain case: src add_column -> stage-1 keep-latest MV evolves
    on ITS tick -> a downstream keep-latest stage evolves on its NEXT
    tick (the DDL commit is a changelog skip-op; the column arrives
    with the refreshed images), while a downstream AGG stage is
    unaffected by construction (its schema is derived)."""
    wh = _mk(spark, tmp_path, "evc", tables=("src", "mv1", "mv2", "agg"))
    d = str(tmp_path / "evc")
    ck1, ck2, cka = f"{d}/ck1.json", f"{d}/ck2.json", f"{d}/cka.json"
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(k, 0, k, k * 10) for k in range(4)], SCHEMA
        ),
        batch_id="b0",
    )

    def drain():
        maintain_keep_latest_mv(
            wh, ("lab", "src"), ("lab", "mv1"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck1,
        )
        maintain_keep_latest_mv(
            wh, ("lab", "mv1"), ("lab", "mv2"), ["k"],
            ts_col="ts", tie_col="eid", checkpoint_file=ck2,
        )
        maintain_agg_mv(
            wh, ("lab", "mv1"), ("lab", "agg"), ["k"],
            sum_cols=["v"], checkpoint_file=cka,
        )

    drain()
    wh.add_column("lab", "src", "extra", "string")
    wh.merge_upsert(
        "lab", "src",
        spark.createDataFrame(
            [(2, 1, 10, 21, "x")], SCHEMA + ", extra string"
        ),
        ["k"], mode="merge-on-read",
    )
    drain()
    for t in ("mv1", "mv2"):
        got = {
            r["k"]: r["extra"] for r in wh.read("lab", t).collect()
        }
        assert got == {0: None, 1: None, 2: "x", 3: None}, t
    # the agg stage's derived schema is untouched and still exact
    agg = {
        r["k"]: (r["cnt"], r["sum_v"])
        for r in wh.read("lab", "agg").collect()
    }
    assert agg[2] == (1, 21) and agg[0] == (1, 0)
    assert sorted(wh.read("lab", "agg").columns) == [
        "avg_v", "cnt", "k", "nn_v", "sum_v",
    ]


def test_new_column_touched_by_window_only(spark, tmp_path):
    """The evolution lands even when the evolving commit's window is
    pulled through the keys-only superset changelog, and a key whose
    latest source row PREDATES the column correctly refreshes to NULL
    (redelivery shape)."""
    wh = _mk(spark, tmp_path, "evw")
    ck = str(tmp_path / "evw" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 5, 9, 10)], SCHEMA),
        batch_id="b0",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    wh.add_column("lab", "src", "extra", "string")
    # the new commit touches key 1 but with an OLDER ts: keep-latest
    # keeps the pre-evolution row, whose 'extra' is NULL
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(1, 1, 1, 99, "stale")], SCHEMA + ", extra string"
        ),
        batch_id="b1",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    rows = wh.read("lab", "mv").collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 10 and rows[0]["extra"] is None
    assert "extra" in wh.read("lab", "mv").columns

def test_crash_between_evolution_and_merge_recovers(spark, tmp_path):
    """The evolution DDL and the data merge are TWO commits: a crash
    between them leaves an evolved-but-stale MV and an un-advanced
    checkpoint.  The redelivered tick must find the column already
    present (add_column is not retried) and land the data."""
    wh = _mk(spark, tmp_path, "evx")
    ck = str(tmp_path / "evx" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 0, 1, 10)], SCHEMA), batch_id="b0",
    )
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    wh.add_column("lab", "src", "extra", "string")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(2, 1, 2, 20, "x")], SCHEMA + ", extra string"
        ),
        batch_id="b1",
    )
    orig = wh.merge_upsert

    def boom(*a, **kw):
        raise RuntimeError("crash after evolution, before merge")

    wh.merge_upsert = boom
    try:
        with pytest.raises(RuntimeError, match="before merge"):
            maintain_keep_latest_mv(
                wh, ("lab", "src"), ("lab", "mv"), ["k"],
                ts_col="ts", tie_col="eid", checkpoint_file=ck,
            )
    finally:
        del wh.merge_upsert
    # evolved but stale: the DDL landed, the data did not
    assert "extra" in {
        f["name"] for f in wh.table_schema("lab", "mv")
    }
    assert {r["k"] for r in wh.read("lab", "mv").collect()} == {1}
    # redelivery: no duplicate add_column, data lands
    maintain_keep_latest_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    got = {
        r["k"]: r["extra"] for r in wh.read("lab", "mv").collect()
    }
    assert got == {1: None, 2: "x"}


def test_diverged_type_refuses_with_context(spark, tmp_path, capsys):
    """r18 (VERDICT r17 #6): a source column whose type diverged from
    the MV's recorded type refuses AT THE EVOLUTION GATE, naming the
    column and both sides (it used to surface as a raw conformance
    error from deep inside the merge, naming neither source nor MV);
    the mv-tick CLI adds the maintainer identities.  Widening the MV
    (the documented fix in the message) unblocks the tick, which then
    converges — the legal direction (source narrower than MV) was
    never blocked."""
    from hands_on_iceberg_compression_spark.__main__ import main as cli_main

    wh = _mk(spark, tmp_path, "dvt")
    ck = str(tmp_path / "dvt" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 0, 1, 10), (2, 0, 2, 20)], SCHEMA),
        batch_id="b0",
    )
    tick = lambda: maintain_keep_latest_mv(  # noqa: E731
        wh, ("lab", "src"), ("lab", "mv"), ["k"],
        ts_col="ts", tie_col="eid", checkpoint_file=ck,
    )
    tick()
    # source widens v int -> bigint; the MV still records int
    wh.widen_column("lab", "src", "v", "bigint")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(3, 1, 3, 2**40)], "k int, ts int, eid int, v bigint"
        ),
        batch_id="b1",
    )
    with pytest.raises(ValueError, match="'v' is bigint.*int in the MV"):
        tick()
    # the CLI names the maintainer identities around the same refusal
    rc = cli_main([
        "mv-tick", "--warehouse", wh.root, "--kind", "keep-latest",
        "--src", "lab.src", "--mv", "lab.mv", "--keys", "k",
        "--ts-col", "ts", "--tie-col", "eid", "--checkpoint", ck,
    ])
    err = capsys.readouterr().err
    assert rc == 1
    assert "refused (src=lab.src, mv=lab.mv)" in err and "'v'" in err
    # the documented fix: widen the MV, then the tick converges
    wh.widen_column("lab", "mv", "v", "bigint")
    tick()
    got = sorted(
        (r["k"], r["v"]) for r in wh.read("lab", "mv").collect()
    )
    assert got == [(1, 10), (2, 20), (3, 2**40)]
