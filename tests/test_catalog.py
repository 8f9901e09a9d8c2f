"""Catalog-level multi-table versioning (VERDICT r9 "what's missing"
#4): one ref versioning ALL tables — Nessie's distinctive capability
(the catalog the reference deploys, compose/docker-compose.yaml:61-70).
A catalog head pins {schema.table: version}; ``publish_tables``
fast-forwards each table's staged branch then publishes ONE catalog
commit, so two tables that must land together do.

Contracts pinned:
- the catalog CAS is the atomicity point: a crash BETWEEN two table
  publishes never exposes a torn view to catalog readers — the catalog
  head still pins the old versions of BOTH tables;
- the retried publish is idempotent: already-forwarded halves are
  detected (head records from_branch/branch_head) and skipped;
- ``read_catalog_as_of`` time-travels the WHOLE catalog: every table at
  the versions one commit pinned together;
- unlisted tables carry forward through later catalog commits;
- per-table ``expire_snapshots`` RETAINS catalog-pinned versions (the
  tag-retention contract) until ``expire_catalog`` drops the heads;
- randomized: single-table commits, catalog commits, staged publishes,
  crashed publishes, and expiry interleave — every live catalog head
  stays materializable and matches a dict model.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.sources.warehouse import ParquetWarehouse


@pytest.fixture()
def cat_wh(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    for t in ("orders", "items"):
        wh.create_table(
            "shop", t, "zstd", 1, properties={"snapshots": "true"}
        )
        wh.append(
            "shop", t,
            spark.createDataFrame(
                [(j, f"{t}0") for j in range(5)], "id int, src string"
            ),
            batch_id="b0",
        )
    return wh


def test_catalog_roundtrip_and_carry_forward(cat_wh, spark):
    wh = cat_wh
    c1 = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    assert c1["version"] == 1
    assert set(c1["tables"]) == {"shop.orders", "shop.items"}
    # both tables move; the catalog still reads the OLD pair consistently
    for t in ("orders", "items"):
        wh.append(
            "shop", t,
            spark.createDataFrame([(100, f"{t}1")], "id int, src string"),
            batch_id="b1",
        )
    view1 = wh.read_catalog_as_of(1)
    assert {k: v.count() for k, v in view1.items()} == {
        "shop.orders": 5, "shop.items": 5,
    }
    # pin only orders: items carries forward at its OLD pinned version
    c2 = wh.commit_catalog([("shop", "orders")])
    assert c2["version"] == 2
    assert c2["tables"]["shop.orders"] > c1["tables"]["shop.orders"]
    assert c2["tables"]["shop.items"] == c1["tables"]["shop.items"]
    view2 = wh.read_catalog_as_of()  # latest
    assert view2["shop.orders"].count() == 6
    assert view2["shop.items"].count() == 5
    with pytest.raises(ValueError, match="no catalog version"):
        wh.catalog_head(99)


def test_crash_between_publishes_never_torn(cat_wh, spark, monkeypatch):
    """The done-gate: a crash AFTER table one fast-forwarded but BEFORE
    the catalog commit leaves catalog readers on the old versions of
    BOTH tables; the retried publish completes idempotently."""
    wh = cat_wh
    base = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    for t in ("orders", "items"):
        wh.create_branch("shop", t, "release")
        wh.append(
            "shop", t,
            spark.createDataFrame([(200, "staged")], "id int, src string"),
            batch_id="bf",
            branch="release",
        )
    real_ff = wh.fast_forward
    calls = {"n": 0}

    def crashing_ff(schema, table, name):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between table publishes")
        return real_ff(schema, table, name)

    monkeypatch.setattr(wh, "fast_forward", crashing_ff)
    with pytest.raises(OSError, match="simulated crash"):
        wh.publish_tables({
            ("shop", "items"): "release",
            ("shop", "orders"): "release",
        })
    monkeypatch.setattr(wh, "fast_forward", real_ff)
    # torn state on DIRECT reads (items forwarded, orders not — sorted
    # order publishes items first) ...
    assert wh.read("shop", "items").count() == 6
    assert wh.read("shop", "orders").count() == 5
    # ... but the CATALOG still pins the old pair: no torn view
    assert wh.catalog_head()["version"] == base["version"]
    view = wh.read_catalog_as_of()
    assert {k: v.count() for k, v in view.items()} == {
        "shop.orders": 5, "shop.items": 5,
    }
    # retry completes: the already-published items half is SKIPPED (its
    # version does not move again), orders forwards, one catalog commit
    items_v = wh._latest_version("shop", "items")
    out = wh.publish_tables({
        ("shop", "items"): "release",
        ("shop", "orders"): "release",
    })
    assert wh._latest_version("shop", "items") == items_v  # idempotent
    assert out["version"] == base["version"] + 1
    view = wh.read_catalog_as_of()
    assert {k: v.count() for k, v in view.items()} == {
        "shop.orders": 6, "shop.items": 6,
    }


def test_expire_retains_catalog_pins(cat_wh, spark):
    wh = cat_wh
    pinned = wh.commit_catalog([("shop", "orders")])
    pv = pinned["tables"]["shop.orders"]
    for i in range(3):
        wh.append(
            "shop", "orders",
            spark.createDataFrame([(300 + i, "x")], "id int, src string"),
            batch_id=f"e{i}",
        )
    wh.expire_snapshots("shop", "orders", keep_last=1)
    # the pinned version survived expiry and still reads exactly
    assert wh.read_snapshot("shop", "orders", pv).count() == 5
    assert wh.read_catalog_as_of()["shop.orders"].count() == 5
    # dropping the catalog head releases the pin; the next expiry GCs it
    assert wh.expire_catalog(keep_last=1) == 0  # only one head: kept
    wh.commit_catalog([("shop", "orders")])  # re-pin at the new head
    assert wh.expire_catalog(keep_last=1) == 1
    wh.expire_snapshots("shop", "orders", keep_last=1)
    with pytest.raises(Exception):
        wh.read_snapshot("shop", "orders", pv).count()


# --- randomized: single-table and catalog commits interleave ----------


@contextlib.contextmanager
def _mk_wh2():
    root = tempfile.mkdtemp(prefix="cat_model_")
    wh = ParquetWarehouse(None, root)  # log layer is Spark-free
    for t in ("t1", "t2"):
        wh.create_table(
            "lab", t, "zstd", 1, properties={"snapshots": "true"}
        )
    try:
        yield wh
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _write_file(tdir: str, batch: str, name: str) -> str:
    d = os.path.join(tdir, "data", batch, "g_0")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{name}.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), p)
    return p


CAT_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "append1", "append2",          # single-table commits
                "catalog_both", "catalog_one",  # catalog pins + carry
                "stage_publish",                # atomic two-table publish
                "crash_publish",                # torn mid-publish + retry
                "expire1", "expire_catalog",    # retention interplay
                # r11 catalog branches: one named ref staging N tables
                "cb_fork", "cb_stage", "cb_publish", "cb_drop",
            ]
        ),
        st.integers(0, 9),
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(ops=CAT_OPS)
def test_random_catalog_sequences_match_model(ops):
    with _mk_wh2() as wh:
        tdirs = {t: wh._tdir("lab", t) for t in ("t1", "t2")}
        # model: catalog version -> {table key: pinned version} (None =
        # expired); every LIVE head must match and stay materializable
        cat_model: dict[int, dict | None] = {}
        # catalog branches: name -> {"fork_catalog", "tables": {key:
        # {"fork": table version at stage time, "staged": [rel files]}}}
        cb_model: dict[str, dict] = {}
        counter = 0
        stage_n = 0
        cb_n = 0

        def table_v(t):
            return wh._latest_version("lab", t)

        def do_append(t):
            nonlocal counter
            counter += 1
            batch = f"b{counter:03d}"
            f = _write_file(tdirs[t], batch, "f0")
            wh.commit_snapshot(
                "lab", t, "append", add_files=[f],
                drop_prefix=os.path.join(tdirs[t], "data", batch) + os.sep,
            )

        def model_commit(pins):
            head = wh.catalog_head()
            assert head is not None
            # carry-forward mirrors the PREVIOUS version's map (the
            # newest head is never expired, so it is always version-1)
            prev = cat_model.get(head["version"] - 1)
            merged = dict(prev) if prev else {}
            merged.update(pins)
            cat_model[head["version"]] = merged
            assert head["tables"] == merged

        def check():
            latest = wh.latest_catalog_version()
            live = [v for v, m in cat_model.items() if m is not None]
            assert latest == (max(live) if live else None)
            for v in live:
                head = wh.catalog_head(v)
                assert head["tables"] == cat_model[v]
                for key, pv in head["tables"].items():
                    s, t = key.split(".", 1)
                    wh._load_snapshot(s, t, pv)  # stays materializable
            got_cb = wh.catalog_branches()
            assert set(got_cb) == set(cb_model)
            for name, bm in cb_model.items():
                assert got_cb[name]["tables"] == sorted(bm["tables"])
                assert got_cb[name]["fork_catalog"] == bm["fork_catalog"]
                tref = wh.catalog_branch_table_ref(name)
                for key, tm in bm["tables"].items():
                    s, t = key.split(".", 1)
                    # the staging branch's file set = fork files + stages
                    bh = wh._load_snapshot(
                        s, t,
                        wh._snapshot_versions(s, t, tref)[-1], tref,
                    )
                    got = {e["path"] for e in bh["files"]}
                    assert got == tm["fork_files"] | set(tm["staged"])

        for op, pick in ops:
            if op in ("append1", "append2"):
                do_append("t1" if op == "append1" else "t2")
            elif op == "catalog_both":
                if not (table_v("t1") and table_v("t2")):
                    continue
                wh.commit_catalog([("lab", "t1"), ("lab", "t2")])
                model_commit({
                    "lab.t1": table_v("t1"), "lab.t2": table_v("t2"),
                })
            elif op == "catalog_one":
                t = "t1" if pick % 2 else "t2"
                if not table_v(t):
                    continue
                wh.commit_catalog([("lab", t)])
                model_commit({f"lab.{t}": table_v(t)})
            elif op in ("stage_publish", "crash_publish"):
                if not (table_v("t1") and table_v("t2")):
                    continue
                stage_n += 1
                name = f"rel{stage_n:03d}"
                for t in ("t1", "t2"):
                    wh.create_branch("lab", t, name)
                    counter += 1
                    f = _write_file(tdirs[t], f"s{counter:03d}", "f0")
                    wh.commit_snapshot(
                        "lab", t, "append", add_files=[f], branch=name,
                    )
                if op == "crash_publish":
                    # deterministic torn publish: t2's branch is dropped
                    # mid-flight, so sorted order forwards t1 then raises
                    wh.drop_branch("lab", "t2", name)
                    before = wh.latest_catalog_version()
                    with pytest.raises(ValueError, match="no branch"):
                        wh.publish_tables({
                            ("lab", "t1"): name, ("lab", "t2"): name,
                        })
                    # torn on direct reads, UNTOUCHED at the catalog
                    assert wh.latest_catalog_version() == before
                    # recover: restage t2 and retry — t1 half skipped
                    wh.create_branch("lab", "t2", name)
                    counter += 1
                    f = _write_file(tdirs["t2"], f"s{counter:03d}", "f0")
                    wh.commit_snapshot(
                        "lab", "t2", "append", add_files=[f], branch=name,
                    )
                    t1_v = table_v("t1")
                    wh.publish_tables({
                        ("lab", "t1"): name, ("lab", "t2"): name,
                    })
                    assert table_v("t1") == t1_v  # idempotent retry
                else:
                    wh.publish_tables({
                        ("lab", "t1"): name, ("lab", "t2"): name,
                    })
                model_commit({
                    "lab.t1": table_v("t1"), "lab.t2": table_v("t2"),
                })
                for t in ("t1", "t2"):
                    wh.drop_branch("lab", t, name)
            elif op == "cb_fork":
                cb_n += 1
                name = f"cbr{cb_n:03d}"
                wh.create_catalog_branch(name)
                live = [v for v, m in cat_model.items() if m is not None]
                cb_model[name] = {
                    "fork_catalog": max(live) if live else None,
                    "tables": {},
                }
            elif op == "cb_stage" and cb_model:
                t = "t1" if pick % 2 else "t2"
                if not table_v(t):
                    continue
                name = sorted(cb_model)[pick % len(cb_model)]
                bm = cb_model[name]
                key = f"lab.{t}"
                tref = wh.stage_on_catalog_branch(name, "lab", t)
                if key not in bm["tables"]:
                    fork_head = wh._load_snapshot("lab", t, table_v(t))
                    bm["tables"][key] = {
                        "fork": table_v(t),
                        "fork_files": {
                            e["path"] for e in fork_head["files"]
                        },
                        "staged": [],
                    }
                counter += 1
                f = _write_file(tdirs[t], f"cb{counter:03d}", "f0")
                wh.commit_snapshot(
                    "lab", t, "append", add_files=[f], branch=tref,
                )
                bm["tables"][key]["staged"].append(
                    os.path.relpath(f, tdirs[t])
                )
            elif op == "cb_publish" and cb_model:
                name = sorted(cb_model)[pick % len(cb_model)]
                bm = cb_model[name]
                if not bm["tables"]:
                    with pytest.raises(ValueError, match="no staged"):
                        wh.publish_catalog_branch(name)
                elif any(
                    table_v(k.split(".", 1)[1]) != tm["fork"]
                    for k, tm in bm["tables"].items()
                ):
                    # main moved past a staged table's fork: the publish
                    # refuses (possibly after forwarding non-diverged
                    # halves — torn on direct reads, never at the
                    # catalog, same contract as crash_publish)
                    before = wh.latest_catalog_version()
                    with pytest.raises(RuntimeError, match="diverged"):
                        wh.publish_catalog_branch(name)
                    assert wh.latest_catalog_version() == before
                    wh.drop_catalog_branch(name)
                    del cb_model[name]
                else:
                    wh.publish_catalog_branch(name)
                    model_commit({
                        key: table_v(key.split(".", 1)[1])
                        for key in bm["tables"]
                    })
                    wh.drop_catalog_branch(name)
                    del cb_model[name]
            elif op == "cb_drop" and cb_model:
                name = sorted(cb_model)[pick % len(cb_model)]
                wh.drop_catalog_branch(name)
                del cb_model[name]
            elif op == "expire1" and table_v("t1"):
                wh.expire_snapshots("lab", "t1", keep_last=(pick % 2) + 1)
            elif op == "expire_catalog" and wh.latest_catalog_version():
                keep = (pick % 2) + 1
                live = sorted(
                    v for v, m in cat_model.items() if m is not None
                )
                # catalog-branch forks are retained like tags
                protected = {
                    bm["fork_catalog"]
                    for bm in cb_model.values()
                    if bm["fork_catalog"] is not None
                }
                wh.expire_catalog(keep_last=keep)
                for v in live[:-keep]:
                    if v not in protected:
                        cat_model[v] = None
            check()


def test_publish_retry_resumes_past_unrelated_commits(cat_wh, spark, monkeypatch):
    """Review finding #4: the crash-retry idempotency check must WALK
    history, not just inspect the head — an unrelated commit landing on
    top of the already-forwarded half otherwise makes the retry raise
    'diverged' forever."""
    wh = cat_wh
    base = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    for t in ("orders", "items"):
        wh.create_branch("shop", t, "rel2")
        wh.append(
            "shop", t,
            spark.createDataFrame([(400, "staged")], "id int, src string"),
            batch_id="bf2", branch="rel2",
        )
    real_ff = wh.fast_forward
    calls = {"n": 0}

    def crashing_ff(schema, table, name):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("crash")
        return real_ff(schema, table, name)

    monkeypatch.setattr(wh, "fast_forward", crashing_ff)
    with pytest.raises(OSError):
        wh.publish_tables({
            ("shop", "items"): "rel2", ("shop", "orders"): "rel2",
        })
    monkeypatch.setattr(wh, "fast_forward", real_ff)
    # an UNRELATED commit lands on the already-forwarded items table
    wh.append(
        "shop", "items",
        spark.createDataFrame([(500, "unrelated")], "id int, src string"),
        batch_id="u0",
    )
    out = wh.publish_tables({
        ("shop", "items"): "rel2", ("shop", "orders"): "rel2",
    })
    assert out["version"] == base["version"] + 1
    view = wh.read_catalog_as_of()
    # items pinned at its PUBLISH version (5+1 staged), not the later
    # unrelated append; orders publishes fresh
    assert view["shop.items"].count() == 6
    assert view["shop.orders"].count() == 6
    assert wh.read("shop", "items").count() == 7  # live head has both


def test_catalog_tags_pin_whole_pipeline_releases(cat_wh, spark):
    """Catalog tags: one named ref = the whole pipeline's state at a
    release; retained through expire_catalog, transitively retaining
    every pinned table snapshot through per-table expiry."""
    wh = cat_wh
    wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    wh.create_catalog_tag("release-v1")
    assert wh.catalog_tags() == {"release-v1": 1}
    with pytest.raises(ValueError, match="already exists"):
        wh.create_catalog_tag("release-v1")
    # pipeline moves on: new data, new catalog versions, expiry
    for i in range(2):
        for t in ("orders", "items"):
            wh.append(
                "shop", t,
                spark.createDataFrame([(600 + i, "x")], "id int, src string"),
                batch_id=f"r{i}",
            )
        wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    assert wh.expire_catalog(keep_last=1) == 1  # v2 dropped, v1 TAGGED
    for t in ("orders", "items"):
        wh.expire_snapshots("shop", t, keep_last=1)
    # the tagged release still reads exactly (catalog + table retention)
    view = wh.read_catalog_as_of_tag("release-v1")
    assert {k: v.count() for k, v in view.items()} == {
        "shop.orders": 5, "shop.items": 5,
    }
    # dropping the tag releases everything on the next expiry passes
    wh.drop_catalog_tag("release-v1")
    assert wh.expire_catalog(keep_last=1) == 1
    with pytest.raises(ValueError, match="no catalog tag"):
        wh.read_catalog_as_of_tag("release-v1")


def test_branch_time_travel(cat_wh, spark):
    wh = cat_wh
    wh.create_branch("shop", "orders", "bt")
    v0 = wh._snapshot_versions("shop", "orders", "bt")[-1]
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(700, "staged")], "id int, src string"),
        batch_id="bt0", branch="bt",
    )
    v1 = wh._snapshot_versions("shop", "orders", "bt")[-1]
    assert wh.read_snapshot("shop", "orders", v0, branch="bt").count() == 5
    assert wh.read_snapshot("shop", "orders", v1, branch="bt").count() == 6


def test_stale_hint_below_tag_gap_cannot_fork_history(cat_wh, spark, tmp_path):
    """Review finding (r10 second pass): tag retention leaves version
    GAPS after expiry; a stale hint at a retained old version must never
    make the next commit CAS into the gap (which would orphan the real
    head and its pins).  Catalog discovery is listing-authoritative;
    table hints are monotone and refreshed by expiry."""
    wh = cat_wh
    for _ in range(3):
        wh.commit_catalog([("shop", "orders")])
    wh.create_catalog_tag("old", version=1)
    assert wh.expire_catalog(keep_last=1) == 1  # v2 gone; v1 TAGGED, v3 head
    # adversarial stale hint below the gap
    with open(os.path.join(wh._catalog_dir(), "version-hint.txt"), "w") as f:
        f.write("1")
    assert wh.latest_catalog_version() == 3  # listing wins, gap ignored
    out = wh.commit_catalog([("shop", "items")])
    assert out["version"] == 4  # NOT 2 — no fork into the gap
    assert out["tables"]["shop.orders"] == 1  # carried from the real head
    # table side: monotone hint + expiry refresh
    wh.create_tag("shop", "orders", "keep", version=1)
    for i in range(3):
        wh.append(
            "shop", "orders",
            spark.createDataFrame([(800 + i, "x")], "id int, src string"),
            batch_id=f"g{i}",
        )
    head_v = wh._latest_version("shop", "orders")
    # adversarial stale hint at the tagged version, then expiry creates
    # the gap AND refreshes the hint to the true head
    with open(wh._hint_path("shop", "orders"), "w") as f:
        f.write("1")
    wh.expire_snapshots("shop", "orders", keep_last=1)
    with open(wh._hint_path("shop", "orders")) as f:
        assert int(f.read().strip()) == head_v
    assert wh._latest_version("shop", "orders") == head_v
    # monotone: an older racing hint write never lands
    wh._write_hint_file(wh._hint_path("shop", "orders"), 1)
    with open(wh._hint_path("shop", "orders")) as f:
        assert int(f.read().strip()) == head_v


def test_commit_catalog_writes_no_hint(cat_wh):
    """ADVICE r10 (low): the catalog deliberately has NO version-hint
    protocol (discovery is listing-authoritative because tag retention
    leaves gaps); a dead hint file would invite a future reader to wire
    _probe_latest to it and reintroduce the CAS-into-gap history fork."""
    wh = cat_wh
    wh.commit_catalog([("shop", "orders")])
    assert not os.path.exists(
        os.path.join(wh._catalog_dir(), "version-hint.txt")
    )


# --- catalog BRANCHES (VERDICT r10 #4): one named ref, N staged tables --


def test_catalog_branch_pipeline(cat_wh, spark):
    """Fork -> stage two tables through ONE named ref -> read the
    branch's consistent view -> publish with one catalog commit."""
    wh = cat_wh
    c0 = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    wh.create_catalog_branch("rel1")
    ref_o = wh.stage_on_catalog_branch("rel1", "shop", "orders")
    ref_i = wh.stage_on_catalog_branch("rel1", "shop", "items")
    assert ref_o == ref_i == "catb_rel1"
    assert ref_o == wh.stage_on_catalog_branch("rel1", "shop", "orders")
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(100, "staged")], "id int, src string"),
        batch_id="s0", branch=ref_o,
    )
    wh.append(
        "shop", "items",
        spark.createDataFrame([(200, "staged")], "id int, src string"),
        batch_id="s1", branch=ref_i,
    )
    # mains and the catalog are untouched while staged
    assert wh.read("shop", "orders").count() == 5
    assert wh.read("shop", "items").count() == 5
    assert wh.latest_catalog_version() == c0["version"]
    # the branch view: staged state for both tables
    view = wh.read_catalog_branch("rel1")
    assert sorted(view) == ["shop.items", "shop.orders"]
    assert view["shop.orders"].count() == 6
    assert view["shop.items"].count() == 6
    bl = wh.catalog_branches()
    assert bl["rel1"]["tables"] == ["shop.items", "shop.orders"]
    assert bl["rel1"]["fork_catalog"] == c0["version"]
    # publish: ONE catalog commit pins both published versions
    out = wh.publish_catalog_branch("rel1")
    assert out["version"] == c0["version"] + 1
    assert out["operation"] == "publish_branch:rel1"
    assert wh.read("shop", "orders").count() == 6
    assert wh.read("shop", "items").count() == 6
    for key, v in out["tables"].items():
        s, t = key.split(".", 1)
        assert v == wh._latest_version(s, t)
    # catalog time travel still sees the pre-publish instant
    old = wh.read_catalog_as_of(c0["version"])
    assert old["shop.orders"].count() == 5
    wh.drop_catalog_branch("rel1")
    assert "rel1" not in wh.catalog_branches()
    assert "catb_rel1" not in wh.branches("shop", "orders")
    with pytest.raises(ValueError, match="no catalog branch"):
        wh.read_catalog_branch("rel1")


def test_catalog_branch_fork_view_for_unstaged_tables(cat_wh, spark):
    """A table the fork catalog pinned but the branch never wrote reads
    at its FORK-pinned version — main movement since is invisible."""
    wh = cat_wh
    c0 = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    wh.create_catalog_branch("iso")
    ref = wh.stage_on_catalog_branch("iso", "shop", "orders")
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(101, "staged")], "id int, src string"),
        batch_id="s0", branch=ref,
    )
    # main of the UNSTAGED table moves after the fork
    wh.append(
        "shop", "items",
        spark.createDataFrame([(300, "later")], "id int, src string"),
        batch_id="m0",
    )
    view = wh.read_catalog_branch("iso")
    assert view["shop.orders"].count() == 6   # staged write visible
    assert view["shop.items"].count() == 5    # fork view, not main's 6
    wh.drop_catalog_branch("iso")


def test_catalog_branch_crashed_publish_never_torn(cat_wh, spark, monkeypatch):
    """A crash between the two table fast-forwards leaves catalog
    readers on the old pins; the re-run resumes past the published half
    (the _find_publish walk) and completes with ONE catalog commit."""
    wh = cat_wh
    c0 = wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    wh.create_catalog_branch("rel2")
    for t in ("orders", "items"):
        ref = wh.stage_on_catalog_branch("rel2", "shop", t)
        wh.append(
            "shop", t,
            spark.createDataFrame([(400, "staged")], "id int, src string"),
            batch_id="s0", branch=ref,
        )
    real_ff = ParquetWarehouse.fast_forward
    calls = []

    def crashing_ff(self, schema, table, name):
        calls.append(table)
        if len(calls) == 2:
            raise RuntimeError("simulated crash mid-publish")
        return real_ff(self, schema, table, name)

    monkeypatch.setattr(ParquetWarehouse, "fast_forward", crashing_ff)
    with pytest.raises(RuntimeError, match="simulated crash"):
        wh.publish_catalog_branch("rel2")
    monkeypatch.setattr(ParquetWarehouse, "fast_forward", real_ff)
    # torn on direct table reads, UNTOUCHED for catalog readers
    assert wh.latest_catalog_version() == c0["version"]
    assert wh.read_catalog_as_of()["shop.orders"].count() == 5
    items_v = wh._latest_version("shop", "items")
    out = wh.publish_catalog_branch("rel2")  # resume
    assert wh._latest_version("shop", "items") == items_v  # skipped half
    assert out["tables"]["shop.items"] == items_v
    assert wh.read_catalog_as_of()["shop.orders"].count() == 6
    assert wh.read_catalog_as_of()["shop.items"].count() == 6
    wh.drop_catalog_branch("rel2")


def test_catalog_branch_refusals(cat_wh):
    wh = cat_wh
    wh.create_catalog_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        wh.create_catalog_branch("dup")
    with pytest.raises(ValueError, match="no staged tables"):
        wh.publish_catalog_branch("dup")
    with pytest.raises(ValueError, match="no catalog branch"):
        wh.stage_on_catalog_branch("ghost", "shop", "orders")
    with pytest.raises(ValueError, match="invalid catalog branch"):
        wh.create_catalog_branch("bad/name")
    wh.drop_catalog_branch("dup")


def test_crashed_create_catalog_branch_leftover_is_recoverable(cat_wh):
    """Review r11 #4 + second pass: a dir made by a crashed
    create_catalog_branch (no head CAS-linked) must not brick
    catalog_branches/expire/drop — but the cleanup is AGE-GATED, so a
    YOUNG headless dir (possibly an in-flight create about to link v1)
    refuses the drop instead of racing it."""
    import time

    wh = cat_wh
    d = os.path.join(wh._catalog_dir(), "branch_ghost")
    os.makedirs(d)
    assert "ghost" not in wh.catalog_branches()  # skipped, not raised
    wh.commit_catalog([("shop", "orders")])
    wh.expire_catalog(keep_last=1)  # iterates branches — must not raise
    with pytest.raises(ValueError, match="younger than 60s"):
        wh.drop_catalog_branch("ghost")  # fresh dir: in-flight guard
    os.utime(d, (time.time() - 120, time.time() - 120))  # age it out
    wh.drop_catalog_branch("ghost")  # removes the leftover dir
    with pytest.raises(ValueError, match="no catalog branch"):
        wh.drop_catalog_branch("ghost")
    wh.create_catalog_branch("ghost")  # name reusable afterwards
    wh.drop_catalog_branch("ghost")


def test_publish_retry_survives_unrelated_rollback(cat_wh, spark):
    """Review r11 second pass #2: a crashed publish's retry must still
    find its fast-forward when a LATER unrelated commit was rolled back
    — the provenance walk jumps to rolled_back_to and keeps walking
    instead of refusing 'diverged' forever."""
    wh = cat_wh
    wh.commit_catalog([("shop", "orders"), ("shop", "items")])
    wh.create_branch("shop", "orders", "rp")
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(700, "staged")], "id int, src string"),
        batch_id="s0", branch="rp",
    )
    # half-publish: the table forwarded, the catalog commit "crashed"
    ff_v = wh.fast_forward("shop", "orders", "rp")["version"]
    # unrelated commit lands on top, then is rolled back
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(701, "bad")], "id int, src string"),
        batch_id="m0",
    )
    wh.rollback_to_snapshot("shop", "orders", ff_v)
    # the retry finds the still-effective publish below the rollback
    out = wh.publish_tables({("shop", "orders"): "rp"})
    assert out["tables"]["shop.orders"] == ff_v
    assert wh._latest_version("shop", "orders") != ff_v  # no re-forward
    assert wh.read_catalog_as_of()["shop.orders"].count() == 6


def test_stage_concurrent_create_branch_idempotent(cat_wh, monkeypatch):
    """ADVICE r11: two concurrent stagers of the SAME table both see no
    catb_ branch and both call create_branch — the loser must proceed
    idempotently onto the winner's branch, not raise."""
    wh = cat_wh
    wh.create_catalog_branch("race")
    real_create = wh.create_branch

    def losing_create(schema, table, name, version=None):
        # the winner lands the branch between our existence check and
        # our create — then OUR create raises already-exists
        real_create(schema, table, name, version)
        raise ValueError(f"branch {name!r} already exists on "
                         f"{schema}.{table} (drop_branch first)")

    monkeypatch.setattr(wh, "create_branch", losing_create)
    ref = wh.stage_on_catalog_branch("race", "shop", "orders")
    assert ref == "catb_race"
    assert "shop.orders" in wh.catalog_branch_head("race")["tables"]
    # a genuinely different ValueError still propagates
    monkeypatch.setattr(
        wh, "create_branch",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("disk full")),
    )
    wh.drop_catalog_branch("race")
    wh.create_catalog_branch("race2")
    with pytest.raises(ValueError, match="disk full"):
        wh.stage_on_catalog_branch("race2", "shop", "orders")


def test_create_catalog_branch_repins_instead_of_rmtree(
    cat_wh, spark, monkeypatch
):
    """ADVICE r11: when expire_catalog drops the fork pin between the
    create's CAS and its re-check, the create must REPIN in place — the
    old rmtree retry could delete a stage record a concurrent stager
    already landed on the transient v1 head."""
    wh = cat_wh
    wh.commit_catalog([("shop", "orders")])
    fc = wh.commit_catalog([("shop", "items")])["version"]
    real_cas = wh._cas_link

    def expiring_cas(record, path):
        ok = real_cas(record, path)
        if ok and path.endswith(os.path.join("branch_exp", "v000001.json")):
            # a racing expire_catalog (which listed branches before this
            # create published) drops the fork pin right after the CAS
            os.unlink(os.path.join(wh._catalog_dir(), f"v{fc:06d}.json"))
        return ok

    monkeypatch.setattr(wh, "_cas_link", expiring_cas)
    out = wh.create_catalog_branch("exp")
    monkeypatch.setattr(wh, "_cas_link", real_cas)
    # the branch SURVIVED (no rmtree) and was repinned to a live version
    assert out["operation"] == "repin"
    assert out["fork_catalog"] in wh._catalog_versions()
    head = wh.catalog_branch_head("exp")
    assert head["version"] == 2 and head["operation"] == "repin"
    # fully functional afterward: stage, read, publish
    ref = wh.stage_on_catalog_branch("exp", "shop", "orders")
    wh.append(
        "shop", "orders",
        spark.createDataFrame([(900, "staged")], "id int, src string"),
        batch_id="s0", branch=ref,
    )
    assert wh.read_catalog_branch("exp")["shop.orders"].count() == 6
    # expiry now retains the REPINNED version like any fork pin
    wh.commit_catalog([("shop", "orders")])
    wh.expire_catalog(keep_last=1)
    assert head["fork_catalog"] in wh._catalog_versions()


def test_repin_carries_concurrently_staged_tables(cat_wh):
    """_repin_catalog_branch directly: staged records landed between the
    transient create and the repin are carried forward, never lost."""
    wh = cat_wh
    fc = wh.commit_catalog([("shop", "orders")])["version"]
    wh.create_catalog_branch("keep")
    wh.stage_on_catalog_branch("keep", "shop", "items")
    # simulate the fork pin expiring AFTER a stage already landed
    os.unlink(os.path.join(wh._catalog_dir(), f"v{fc:06d}.json"))
    out = wh._repin_catalog_branch("keep")
    assert out["tables"] == ["shop.items"]
    assert out["fork_catalog"] != fc
    assert wh.catalog_branch_head("keep")["tables"] == ["shop.items"]
