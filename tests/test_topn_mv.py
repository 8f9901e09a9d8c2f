"""Incremental TOP-N-per-group MV (r16): ``maintain_topn_mv`` — the
arg-max maintainer generalized to n rows per group.  Convergence
contract, pinned scripted and over randomized DML: after ticking to
the source head the MV equals the batch recompute (row_number over
(order desc, tie desc) <= n) exactly — including the case deltas alone
cannot express: a delete inside the top-n PROMOTES a row the changelog
never mentioned."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
    maintain_topn_mv,
)
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

SCHEMA = "grp int, doc_id int, score int, body string"
N = 3


def _mk(spark, tmp_path, name):
    wh = ParquetWarehouse(spark, str(tmp_path / name))
    wh.create_table("lab", "src", "zstd", 1, properties={"snapshots": "true"})
    wh.create_table("lab", "mv", "zstd", 1, properties={"snapshots": "true"})
    return wh


def _tick(wh, ckpt):
    return maintain_topn_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
        order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
    )


def _mv_rows(wh):
    return sorted(
        (r["grp"], r["rk"], r["doc_id"], r["score"])
        for r in wh.read("lab", "mv").collect()
    )


def _expected(wh):
    if wh.is_empty("lab", "src"):
        return []
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").desc_nulls_last()
    )
    df = (
        wh.read("lab", "src")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= N)
    )
    return sorted(
        (r["grp"], r["rk"], r["doc_id"], r["score"]) for r in df.collect()
    )


def test_scripted_lifecycle(spark, tmp_path):
    wh = _mk(spark, tmp_path, "tn")
    ckpt = str(tmp_path / "tn" / "ck.json")
    # group 0: 5 docs (scores 10..50); group 1: 2 docs (under-filled)
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(0, d, (d + 1) * 10, f"g0d{d}") for d in range(5)]
            + [(1, 10, 7, "g1a"), (1, 11, 3, "g1b")],
            SCHEMA,
        ),
        batch_id="b0",
    )
    out = _tick(wh, ckpt)
    assert out["groups_refreshed"] == -1  # bootstrap
    assert sorted(wh.read("lab", "mv").columns) == [
        "body", "doc_id", "grp", "rk", "score",
    ]
    assert _mv_rows(wh) == _expected(wh)
    got = {(g, rk): (d, s) for g, rk, d, s in _mv_rows(wh)}
    assert got[(0, 1)] == (4, 50) and got[(0, 3)] == (2, 30)
    assert (0, 4) not in got  # capped at N
    assert got[(1, 1)] == (10, 7) and got[(1, 2)] == (11, 3)
    assert (1, 3) not in got  # under-filled group has no rank 3

    # a new high score enters: ranks shift down within the group
    wh.append(
        "lab", "src",
        spark.createDataFrame([(0, 9, 99, "g0new")], SCHEMA),
        batch_id="b1",
    )
    out = _tick(wh, ckpt)
    assert out["groups_refreshed"] == 1
    assert _mv_rows(wh) == _expected(wh)
    got = {(g, rk): (d, s) for g, rk, d, s in _mv_rows(wh)}
    assert got[(0, 1)] == (9, 99) and got[(0, 2)] == (4, 50)

    # THE case deltas cannot express: deleting the current #1 PROMOTES
    # a row (doc 2, score 30) the changelog never mentioned into rank 3
    wh.delete_where("lab", "src", "doc_id = 9", mode="merge-on-read")
    _tick(wh, ckpt)
    assert _mv_rows(wh) == _expected(wh)
    got = {(g, rk): (d, s) for g, rk, d, s in _mv_rows(wh)}
    assert got[(0, 1)] == (4, 50) and got[(0, 3)] == (2, 30)

    # a group shrinking below a rank TOMBSTONES that rank
    wh.delete_where("lab", "src", "grp = 1 AND doc_id = 11")
    _tick(wh, ckpt)
    assert _mv_rows(wh) == _expected(wh)
    got = {(g, rk): (d, s) for g, rk, d, s in _mv_rows(wh)}
    assert (1, 1) in got and (1, 2) not in got

    # redelivery is a no-op (group-idempotent refresh)
    want = _mv_rows(wh)
    with open(ckpt) as f:
        stt = json.load(f)
    stt["version"] = 1
    with open(ckpt, "w") as f:
        json.dump(stt, f)
    _tick(wh, ckpt)
    assert _mv_rows(wh) == want == _expected(wh)


def test_lost_checkpoint_reconciles_and_validation(spark, tmp_path):
    wh = _mk(spark, tmp_path, "tnr")
    ckpt = str(tmp_path / "tnr" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(g, d, g * 10 + d, "x") for g in range(2) for d in range(4)],
            SCHEMA,
        ),
        batch_id="b0",
    )
    _tick(wh, ckpt)
    # source churn while the checkpoint is lost: rank 1 of group 0 dies
    wh.delete_where("lab", "src", "grp = 0 AND doc_id = 3")
    import os

    os.unlink(ckpt)
    out = _tick(wh, ckpt)
    assert out["groups_refreshed"] == -1  # reconcile path
    assert _mv_rows(wh) == _expected(wh)

    # validation: rank-column collision and missing columns refuse
    wh.create_table("lab", "bad", "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "bad",
        spark.createDataFrame([(1, 1, 1, 1)], "grp int, rk int, score int, doc_id int"),
        batch_id="b0",
    )
    with pytest.raises(ValueError, match="rk"):
        maintain_topn_mv(
            wh, ("lab", "bad"), ("lab", "mv"), ["grp"], N,
            order_col="score", tie_col="doc_id",
            checkpoint_file=str(tmp_path / "tnr" / "x.json"),
        )
    with pytest.raises(ValueError, match="nope"):
        maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
            order_col="nope", tie_col="doc_id",
            checkpoint_file=str(tmp_path / "tnr" / "y.json"),
        )
    with pytest.raises(ValueError, match="n="):
        maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], 0,
            order_col="score", tie_col="doc_id",
            checkpoint_file=str(tmp_path / "tnr" / "z.json"),
        )


DML = st.lists(
    st.tuples(
        st.sampled_from(["append", "delete", "upsert", "optimize", "tick"]),
        st.integers(0, 11),
    ),
    min_size=3,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(ops=DML)
def test_randomized_dml_converges(spark, tmp_path_factory, ops):
    wh = _mk(spark, tmp_path_factory.mktemp("tnrand"), "t")
    ckpt = str(tmp_path_factory.mktemp("tnrand_ck") / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(g, d, (g * 7 + d * 3) % 40, "seed")
             for g in range(4) for d in range(5)],
            SCHEMA,
        ),
        batch_id="seed",
    )
    _tick(wh, ckpt)
    doc = 100
    for op, pick in ops:
        doc += 1
        if op == "append":
            wh.append(
                "lab", "src",
                spark.createDataFrame(
                    [(pick % 4, doc, (pick * 13) % 60, "new")], SCHEMA
                ),
                batch_id=f"a{doc}",
            )
        elif op == "delete":
            wh.delete_where(
                "lab", "src",
                f"grp = {pick % 4} AND doc_id % 5 = {pick % 5}",
                mode="merge-on-read",
            )
        elif op == "upsert":
            wh.merge_upsert(
                "lab", "src",
                spark.createDataFrame(
                    [(pick % 4, pick % 20, (pick * 17) % 60, "up")], SCHEMA
                ),
                ["grp", "doc_id"], mode="merge-on-read",
            )
        elif op == "optimize":
            wh.optimize("lab", "src")
        else:
            _tick(wh, ckpt)
    _tick(wh, ckpt)  # drain
    assert _mv_rows(wh) == _expected(wh)


def test_ascending_order(spark, tmp_path):
    """descending=False ranks the SMALLEST (order, tie) first — the
    lowest-perplexity-wins quality-filter shape."""
    wh = _mk(spark, tmp_path, "tna")
    ckpt = str(tmp_path / "tna" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(0, d, (d + 1) * 10, "x") for d in range(5)], SCHEMA
        ),
        batch_id="b0",
    )
    maintain_topn_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
        order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
        descending=False,
    )
    got = {
        (r["grp"], r["rk"]): r["score"]
        for r in wh.read("lab", "mv").collect()
    }
    assert got[(0, 1)] == 10 and got[(0, 3)] == 30
    # a new LOW score displaces from the top of the ascending ranking
    wh.append(
        "lab", "src",
        spark.createDataFrame([(0, 9, 1, "low")], SCHEMA),
        batch_id="b1",
    )
    maintain_topn_mv(
        wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
        order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
        descending=False,
    )
    got = {
        (r["grp"], r["rk"]): r["score"]
        for r in wh.read("lab", "mv").collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 10 and got[(0, 3)] == 20

# --- randomized crash/rewind net (VERDICT r16 advisory #1) -----------------


def _crash_tick(wh, ckpt, after_commit):
    """Crash inside a tick: either the MV merge itself dies (nothing
    lands, checkpoint untouched) or the tick dies right AFTER the MV
    commit but BEFORE the checkpoint advances — the redelivery window
    the commit-before-checkpoint ordering must make harmless.  A window
    with no touched groups never reaches merge_upsert; the tick then
    completes normally, which the net tolerates."""
    orig = wh.merge_upsert

    def wrapped(*a, **kw):
        if not after_commit:
            raise RuntimeError("crash before MV commit")
        orig(*a, **kw)
        raise RuntimeError("crash after MV commit")

    wh.merge_upsert = wrapped
    try:
        _tick(wh, ckpt)
    except RuntimeError:
        pass
    finally:
        del wh.merge_upsert


CRASH_DML = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "delete", "upsert", "optimize", "tick",
             "crash_before", "crash_after", "ckpt_rewind", "ckpt_lost",
             "evolve"]
        ),
        st.integers(0, 11),
    ),
    min_size=4,
    max_size=9,
)


@settings(max_examples=6, deadline=None)
@given(ops=CRASH_DML)
def test_randomized_dml_with_crashes_converges(spark, tmp_path_factory, ops):
    """The join-MV crash net generalized to the top-N maintainer:
    crashes before/after the MV commit, checkpoint rewinds AND losses,
    interleaved with DML and compaction — a drain tick must land
    exactly the batch top-N.  The rank-scaffold anti-join (images ->
    tombstones for shrunken ranks) is the maintainer's novel window;
    redelivered and reconciled ticks drive it against every MV state a
    crash can leave behind."""
    import os

    wh = _mk(spark, tmp_path_factory.mktemp("tncr"), "t")
    ckpt = str(tmp_path_factory.mktemp("tncr_ck") / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(g, d, (g * 7 + d * 3) % 40, "seed")
             for g in range(4) for d in range(5)],
            SCHEMA,
        ),
        batch_id="seed",
    )
    _tick(wh, ckpt)
    doc = 100
    extras: list[str] = []

    def schema():
        return SCHEMA + "".join(f", {c} int" for c in extras)

    def vals(row):
        return [row + tuple(doc + i for i in range(len(extras)))]

    for op, pick in ops:
        doc += 1
        if op == "append":
            wh.append(
                "lab", "src",
                spark.createDataFrame(
                    vals((pick % 4, doc, (pick * 13) % 60, "new")),
                    schema(),
                ),
                batch_id=f"a{doc}",
            )
        elif op == "delete":
            wh.delete_where(
                "lab", "src",
                f"grp = {pick % 4} AND doc_id % 5 = {pick % 5}",
                mode="merge-on-read",
            )
        elif op == "upsert":
            wh.merge_upsert(
                "lab", "src",
                spark.createDataFrame(
                    vals((pick % 4, pick % 20, (pick * 17) % 60, "up")),
                    schema(),
                ),
                ["grp", "doc_id"], mode="merge-on-read",
            )
        elif op == "evolve":
            # r17: the rank-scaffold maintainer must propagate source
            # evolution through whatever crash state it is in
            name = f"x{len(extras)}"
            wh.add_column("lab", "src", name, "int")
            extras.append(name)
        elif op == "optimize":
            wh.optimize("lab", "src")
        elif op == "crash_before":
            _crash_tick(wh, ckpt, after_commit=False)
        elif op == "crash_after":
            _crash_tick(wh, ckpt, after_commit=True)
        elif op == "ckpt_rewind":
            if os.path.exists(ckpt):
                with open(ckpt) as f:
                    stt = json.load(f)
                stt["version"] = max(1, stt["version"] - (pick % 3 + 1))
                with open(ckpt, "w") as f:
                    json.dump(stt, f)
        elif op == "ckpt_lost":
            if os.path.exists(ckpt):
                os.unlink(ckpt)
        else:
            _tick(wh, ckpt)
    _tick(wh, ckpt)  # drain
    assert _mv_rows(wh) == _expected(wh)
    # full-width check over evolved columns: the MV carries every
    # column some delivered window saw; any column it lacks holds no
    # data in the source's current top-n rows (same contract as the
    # chain net — an evolve with no delivered window after it is
    # legitimately un-propagated and all-NULL)
    mv_cols = sorted(wh.read("lab", "mv").columns)
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").desc_nulls_last()
    )
    full = (
        wh.read("lab", "src")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= N)
    )
    assert set(mv_cols) <= set(full.columns)

    def rows_all(df):
        return sorted(
            (tuple((c, r[c]) for c in mv_cols) for r in df.collect()),
            key=lambda t: (dict(t)["grp"], dict(t)["rk"]),
        )

    assert rows_all(wh.read("lab", "mv")) == rows_all(full)
    for c in set(full.columns) - set(mv_cols):
        assert full.filter(F.col(c).isNotNull()).count() == 0


def test_topn_value_cols_projection(spark, tmp_path):
    """r18: ``value_cols`` projects the top-N MV to group + rank +
    ordering + the chosen columns — the "best k docs per domain, carry
    only the score" shape over a wide corpus table.  Pinned: the
    projected MV converges through churn that promotes unmentioned
    rows, dropped columns never appear, and value_cols duplicating
    group/rank/ordering columns refuse."""
    wh = _mk(spark, tmp_path, "vproj")
    ckpt = str(tmp_path / "vproj" / "ck.json")
    wh.append(
        "lab", "src",
        spark.createDataFrame(
            [(g, 10 * g + i, i * 7 % 13, f"b{g}_{i}")
             for g in range(3) for i in range(6)],
            SCHEMA,
        ),
        batch_id="b0",
    )

    def tick():
        return maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
            order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
            value_cols=[],
        )

    tick()
    assert sorted(wh.read("lab", "mv").columns) == [
        "doc_id", "grp", "rk", "score",
    ]

    def expected_proj():
        return sorted(
            (g, rk, d, s) for g, rk, d, s in _expected(wh)
        )

    assert _mv_rows(wh) == expected_proj()
    # churn: delete inside the top-n promotes an unmentioned row; the
    # projected images must still land and tombstone correctly
    wh.delete_where(
        "lab", "src", "grp = 1 AND score = 9", mode="merge-on-read"
    )
    wh.append(
        "lab", "src",
        spark.createDataFrame([(1, 99, 1, "late")], SCHEMA),
        batch_id="b1",
    )
    tick()
    assert _mv_rows(wh) == expected_proj()
    # refusal: a value col that duplicates the ordering column
    with pytest.raises(ValueError, match="duplicate group/rank"):
        maintain_topn_mv(
            wh, ("lab", "src"), ("lab", "mv"), ["grp"], N,
            order_col="score", tie_col="doc_id", checkpoint_file=ckpt,
            value_cols=["score"],
        )
