"""Partition-spec evolution (VERDICT r11 #1) — Iceberg's
``ALTER TABLE ... ADD/DROP PARTITION FIELD`` on the snapshot log.

Contracts pinned:
- add/drop partition field are METADATA-ONLY CAS commits (segment refs
  verbatim, no data file touched); heads carry ALL specs ever
  ({spec_id: [transforms]}) + the current spec_id; entries record their
  write-time ``pid`` (absent = 0 = the create-time meta spec); old
  files are NEVER rewritten.
- reads group files by (schema id, spec id), give each group its OWN
  hive layout, and COMPUTE current-spec derived columns for rows that
  predate them (never NULL-fill — ``ts_day == days(ts)`` must hold on
  every row or predicates silently lose matches across the boundary);
  results are DuckDB-checked across a 3-spec history.
- pruning is per-spec: a file prunes only on ITS spec's partition
  values (+ its bounds); files without the value are kept.
- schema interplay: renaming/dropping a source or output column of ANY
  recorded spec refuses (hive dirs embed the names — VERDICT r11's
  rename-of-a-new-spec's-source case); a non-identity transform's
  derived column joins/leaves the schema in the SAME commit.
- concurrency: an append or rewrite publishing under a spec that moved
  between write and commit refuses (spec_transforms/expected_spec_id
  fences, mirroring the schema fences).
- refs: spec DDL stages on branches; merge_branch adopts branch-only
  spec evolution ID-faithfully; BOTH-sides spec DDL refuses;
  cherry-pick fences picked entries' pids; rollback does NOT revert
  spec DDL; time travel reads each snapshot under its own spec.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

ROWS = [
    (i, f"s{i % 3}", f"2024-01-{1 + i % 5:02d} 10:00:00") for i in range(20)
]


def _batch(spark, offset):
    return spark.createDataFrame(
        [(i + offset, s, ts) for i, s, ts in ROWS],
        "id int, src string, ts string",
    ).selectExpr("id", "src", "cast(ts as timestamp) ts")


@pytest.fixture()
def wh3(spark, tmp_path):
    """A 3-spec table: unpartitioned -> identity(src) -> + days(ts)."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "t", "zstd", 1, properties={"snapshots": "true"})
    wh.append("lab", "t", _batch(spark, 0), batch_id="b0")  # spec 0
    wh.add_partition_field("lab", "t", "src")  # spec 1
    wh.append("lab", "t", _batch(spark, 100), batch_id="b1")
    wh.add_partition_field("lab", "t", "days(ts)")  # spec 2 (+ ts_day col)
    wh.append("lab", "t", _batch(spark, 200), batch_id="b2")
    return wh


def _duck_expected(where=""):
    """DuckDB oracle over the SAME logical rows (all three batches),
    with the derived column's semantics expressed in SQL."""
    con = duckdb.connect()
    vals = ", ".join(
        f"({i + off}, '{s}', TIMESTAMP '{ts}')"
        for off in (0, 100, 200)
        for i, s, ts in ROWS
    )
    q = (
        "SELECT id, src, ts, CAST(ts AS DATE) AS ts_day "
        f"FROM (VALUES {vals}) AS t(id, src, ts) {where} ORDER BY id"
    )
    return [
        (r[0], r[1], str(r[2]), str(r[3])) for r in con.execute(q).fetchall()
    ]


def _spark_rows(df):
    return [
        (r["id"], r["src"], str(r["ts"]), str(r["ts_day"]))
        for r in df.orderBy("id").collect()
    ]


def test_three_spec_history_reads_match_duckdb(wh3):
    """The full mixed-layout read — and predicates on the late-added
    derived column — agree with a DuckDB oracle on every row, including
    rows written BEFORE the column's spec existed."""
    wh = wh3
    df = wh.read("lab", "t")
    assert set(df.columns) == {"id", "src", "ts", "ts_day"}
    assert _spark_rows(df) == _duck_expected()
    got = _spark_rows(df.filter(F.col("ts_day") == F.lit("2024-01-03")))
    assert got == _duck_expected("WHERE CAST(ts AS DATE) = DATE '2024-01-03'")
    assert len(got) == 12  # 4 per batch
    got = _spark_rows(df.filter(F.col("src") == "s1"))
    assert got == _duck_expected("WHERE src = 's1'")


def test_spec_evolution_is_metadata_only(wh3):
    wh = wh3
    h = wh._head_light("lab", "t")
    assert h["specs"] == {
        "0": [], "1": ["src"], "2": ["src", "days(ts)"],
    }
    assert h["spec_id"] == 2
    # DDL commits carried the data segment refs verbatim: versions are
    # append, ddl, append, ddl, append = 5, and the ddl heads share
    # segments with their parents
    v2 = wh._load_head_light("lab", "t", 2)
    v1 = wh._load_head_light("lab", "t", 1)
    assert v2["operation"] == "add_partition_field"
    assert v2["segments"] == v1["segments"]
    # entries carry their write-time pid
    pids = {
        e["path"].split("/")[1]: e.get("pid", 0)
        for e in wh.head_snapshot("lab", "t")["files"]
    }
    assert pids == {"b0": 0, "b1": 1, "b2": 2}


def test_per_spec_pruning(wh3):
    """A file prunes only on ITS OWN spec's partition values; files
    whose spec predates the column are conservatively kept — and the
    pruned read equals the full filtered read exactly."""
    wh = wh3
    kept, total = wh.prune_files("lab", "t", {"src": ["s1"]})
    # spec-0 files (no src value) all kept; spec-1/2 files keep s1 only
    b0 = [p for p in kept if "/b0/" in p]
    b12 = [p for p in kept if "/b0/" not in p]
    assert b0 and all("src=" not in p for p in b0)
    assert b12 and all("src=s1" in p for p in b12)
    full = wh.read("lab", "t").filter("src = 's1'")
    pruned = wh.read_pruned("lab", "t", {"src": ["s1"]}).filter("src = 's1'")
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    # the pruned scan OPENS only the kept files (the footer-open
    # counter: Spark's inputFiles is exactly the file set the plan
    # will touch) — per-spec skipping happened before Spark saw a path
    opened = {
        "/" + p.split("file:")[-1].lstrip("/") for p in pruned.inputFiles()
    }
    assert opened == set(kept)
    # ts_day pruning only skips spec-2 files
    kept2, _t = wh.prune_files(
        "lab", "t", {"ts_day": ("2024-01-03", "2024-01-03")}
    )
    assert all("ts_day=" not in p or "ts_day=2024-01-03" in p for p in kept2)
    assert any("/b0/" in p for p in kept2) and any("/b1/" in p for p in kept2)


def test_schema_interplay_refusals(wh3):
    wh = wh3
    # sources and outputs of ANY recorded spec refuse rename/drop —
    # including after the field is dropped from the current spec
    with pytest.raises(ValueError, match="partitioning"):
        wh.rename_column("lab", "t", "src", "source")
    with pytest.raises(ValueError, match="partitioning"):
        wh.rename_column("lab", "t", "ts", "event_ts")
    with pytest.raises(ValueError, match="partitioning"):
        wh.drop_column("lab", "t", "ts_day")
    wh.drop_partition_field("lab", "t", "days(ts)")  # ts_day leaves schema
    with pytest.raises(ValueError, match="partitioning"):
        wh.rename_column("lab", "t", "ts", "event_ts")  # old spec embeds it
    wh.rename_column("lab", "t", "id", "row_id")  # untouched column: fine
    assert [f["name"] for f in wh.table_schema("lab", "t")] == [
        "row_id", "src", "ts",
    ]


def test_add_refusals(wh3):
    wh = wh3
    with pytest.raises(ValueError, match="already a partition field"):
        wh.add_partition_field("lab", "t", "src")
    wh.add_partition_field("lab", "t", "bucket(4, src)")  # src_bucket: ok
    with pytest.raises(ValueError, match="collides"):
        wh.add_partition_field("lab", "t", "bucket(8, src)")  # name clash
    with pytest.raises(ValueError, match="source column"):
        wh.add_partition_field("lab", "t", "days(nope)")
    wh.add_column("lab", "t", "id_bucket", "bigint")
    with pytest.raises(ValueError, match="already exists"):
        wh.add_partition_field("lab", "t", "bucket(4, id)")
    with pytest.raises(ValueError, match="not a partition field"):
        wh.drop_partition_field("lab", "t", "years(ts)")


def test_drop_and_readd_derived_field(wh3, spark):
    """Drop days(ts) (column leaves the schema), append under the
    narrower spec, re-add it (fresh field id) — every row still reads a
    CORRECT ts_day, whichever era wrote it."""
    wh = wh3
    wh.drop_partition_field("lab", "t", "days(ts)")
    assert "ts_day" not in [f["name"] for f in wh.table_schema("lab", "t")]
    wh.append("lab", "t", _batch(spark, 300), batch_id="b3")
    assert wh.read("lab", "t").count() == 80
    wh.add_partition_field("lab", "t", "days(ts)")
    wh.append("lab", "t", _batch(spark, 400), batch_id="b4")
    df = wh.read("lab", "t")
    assert df.count() == 100
    assert df.filter(F.col("ts_day") != F.to_date("ts")).count() == 0
    assert df.filter(F.col("ts_day").isNull()).count() == 0


def test_concurrent_spec_change_fences(wh3, spark):
    wh = wh3
    head = wh._head_light("lab", "t")
    # an append-shaped commit whose writer derived under a spec that
    # moved in between refuses (spec_transforms fence)
    import os

    tdir = wh._tdir("lab", "t")
    p = os.path.join(tdir, "data", "stale", "g_x")
    _batch(spark, 900).selectExpr(
        "id", "src", "ts", "to_date(ts) ts_day"
    ).coalesce(1).write.partitionBy("src", "ts_day").parquet(p)
    files = sorted(
        os.path.join(b, fn)
        for b, _d, fns in os.walk(p)
        for fn in fns
        if fn.endswith(".parquet")
    )
    wh.drop_partition_field("lab", "t", "days(ts)")  # the race
    with pytest.raises(RuntimeError, match="partition-spec change"):
        wh.commit_snapshot(
            "lab", "t", "append", add_files=files,
            spec_transforms=["src", "days(ts)"],
        )
    # rewrite-shaped fence: read under spec 2, publish after spec moved
    with pytest.raises(RuntimeError, match="partition-spec change"):
        wh.commit_snapshot(
            "lab", "t", "append", add_files=files, expected_spec_id=2,
        )


def test_dml_across_spec_boundary(wh3):
    """delete_where / update_where on a mixed-spec table: victims from
    every era; updated rows land under the CURRENT spec and MOVE dirs
    when a partition source changes."""
    wh = wh3
    out = wh.delete_where("lab", "t", "id = 3 OR id = 103 OR id = 203")
    assert out["rows_deleted"] == 3
    assert wh.read("lab", "t").count() == 57
    # MoR delete across the boundary
    out = wh.delete_where("lab", "t", "id = 4", mode="merge-on-read")
    assert out["rows_deleted"] == 1
    assert wh.read("lab", "t").count() == 56
    # update moves rows between src partitions; derived ts_day re-derives
    out = wh.update_where(
        "lab", "t", "id = 0 OR id = 100 OR id = 200",
        {"src": "'s9'", "ts": "cast('2024-02-01 00:00:00' as timestamp)"},
    )
    assert out["rows_matched"] == 3
    moved = wh.read("lab", "t").filter("src = 's9'")
    assert sorted(r["id"] for r in moved.collect()) == [0, 100, 200]
    assert moved.filter(F.col("ts_day") != F.lit("2024-02-01")).count() == 0
    # the rewritten rows live under the CURRENT spec's layout
    h = wh.head_snapshot("lab", "t")
    upd = [e for e in h["files"] if e["path"].startswith("data/update_")]
    assert upd and all(e.get("pid") == 2 for e in upd)
    assert any("src=s9" in e["path"] for e in upd)
    with pytest.raises(ValueError, match="derived partition column"):
        wh.update_where("lab", "t", "id = 1", {"ts_day": "'2024-03-01'"})


def test_optimize_converges_to_current_spec(wh3):
    wh = wh3
    wh.optimize("lab", "t", target_file_size_bytes=1 << 30)
    h = wh.head_snapshot("lab", "t")
    assert {e.get("pid") for e in h["files"]} == {2}
    assert {p["spec_id"] for p in wh.partitions_report("lab", "t")} == {2}
    assert wh.read("lab", "t").count() == 60
    assert _spark_rows(wh.read("lab", "t")) == _duck_expected()
    # post-compaction pruning now fires on ts_day for every file
    kept, total = wh.prune_files(
        "lab", "t", {"ts_day": ("2024-01-03", "2024-01-03")}
    )
    assert all("ts_day=2024-01-03" in p for p in kept)
    assert len(kept) < total


def test_time_travel_rollback_and_changelog(wh3, spark):
    wh = wh3
    # the changelog skips spec DDL commits (metadata-only) and still
    # emits every append in a window containing two of them
    ch = wh.read_changes("lab", "t", 1, 5)
    assert ch.count() == 40  # b1 + b2; spec DDLs emit nothing
    assert ch.filter(F.col("_change_type") != "insert").count() == 0
    # each snapshot reads under its own spec and schema
    v3 = wh.read_snapshot("lab", "t", 3)  # after b1, before days(ts)
    assert v3.columns == ["id", "src", "ts"] and v3.count() == 40
    # rollback restores the data but NOT the spec DDL
    wh.rollback_to_snapshot("lab", "t", 3)
    assert wh.read("lab", "t").count() == 40
    assert wh.partition_spec("lab", "t")["spec_id"] == 2
    # appends after the rollback land under the CURRENT (kept) spec
    wh.append("lab", "t", _batch(spark, 300), batch_id="b5")
    h = wh.head_snapshot("lab", "t")
    assert {e.get("pid", 0) for e in h["files"]} == {0, 1, 2}
    df = wh.read("lab", "t")
    assert df.count() == 60
    assert df.filter(F.col("ts_day") != F.to_date("ts")).count() == 0


def test_spec_ddl_on_branch_merge_adoption(wh3, spark):
    """Branch-side spec evolution: staged via branch=, invisible on
    main, adopted ID-faithfully by merge_branch after main moved (data
    commits only); BOTH-sides spec DDL refuses."""
    wh = wh3
    wh.create_branch("lab", "t", "dev")
    wh.add_partition_field("lab", "t", "years(ts)", branch="dev")
    assert wh.partition_spec("lab", "t")["spec_id"] == 2  # main untouched
    assert wh.partition_spec("lab", "t", branch="dev")["spec_id"] == 3
    wh.append("lab", "t", _batch(spark, 300), batch_id="s0", branch="dev")
    # main moves with DATA only -> merge adopts the branch's specs then
    # picks the staged commit
    wh.append("lab", "t", _batch(spark, 400), batch_id="m0")
    out = wh.merge_branch("lab", "t", "dev")
    assert out["strategy"] == "cherry_pick"
    assert wh.partition_spec("lab", "t")["spec_id"] == 3
    df = wh.read("lab", "t")
    assert df.count() == 100
    assert "ts_year" in df.columns
    assert df.filter(F.col("ts_year") != F.year("ts")).count() == 0
    # BOTH sides: spec DDL on main + on a fresh branch since the fork
    wh.create_branch("lab", "t", "dev2")
    wh.add_partition_field("lab", "t", "bucket(4, id)", branch="dev2")
    wh.append("lab", "t", _batch(spark, 500), batch_id="s1", branch="dev2")
    wh.drop_partition_field("lab", "t", "years(ts)")  # main-side spec DDL
    with pytest.raises(RuntimeError, match="BOTH sides"):
        wh.merge_branch("lab", "t", "dev2")


def test_cherry_pick_pid_fence(wh3, spark):
    """A lone cherry-pick of a commit staged under a spec main never
    adopted refuses at the pid fence (merge_branch is the path that adopts
    first)."""
    wh = wh3
    wh.create_branch("lab", "t", "px")
    # identity transform: NO schema change, so the sid fence passes and
    # the pick reaches the pid fence
    wh.add_partition_field("lab", "t", "id", branch="px")
    wh.append("lab", "t", _batch(spark, 300), batch_id="s0", branch="px")
    v = wh._snapshot_versions("lab", "t", "px")[-1]
    wh.append("lab", "t", _batch(spark, 400), batch_id="m0")  # diverge
    with pytest.raises(RuntimeError, match="partition spec id"):
        wh.cherry_pick("lab", "t", "px", v)


def test_drop_refuses_when_remaining_transform_depends(wh3):
    """Review r12 #2: dropping days(ts) while bucket(4, ts_day) remains
    in the spec would leave every append deriving from a column the
    schema no longer has — refused; dropping the dependent first
    unblocks."""
    wh = wh3
    wh.add_partition_field("lab", "t", "bucket(4, ts_day)")
    with pytest.raises(ValueError, match="source of remaining"):
        wh.drop_partition_field("lab", "t", "days(ts)")
    wh.drop_partition_field("lab", "t", "bucket(4, ts_day)")
    wh.drop_partition_field("lab", "t", "days(ts)")
    assert wh.partition_spec("lab", "t")["transforms"] == ["src"]


def test_cherry_pick_pid0_canon_equivalence(spark, tmp_path):
    """Review r12 #3: a whitespace-variant create-time spec must compare
    equal across refs once one side's specs dict is canon-seeded — a
    branch data commit at pid 0 picks onto a spec-evolved main."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table(
        "lab", "c", "zstd", 1, properties={"snapshots": "true"},
        partitioning=["bucket(4,src)"],  # note: no space
    )
    wh.append("lab", "c", _batch(spark, 0), batch_id="b0")
    wh.create_branch("lab", "c", "dev")
    wh.append("lab", "c", _batch(spark, 100), batch_id="s0", branch="dev")
    v = wh._snapshot_versions("lab", "c", "dev")[-1]
    # main spec-evolves (seeds a CANONICALIZED specs dict) and diverges
    wh.add_partition_field("lab", "c", "days(ts)")
    wh.append("lab", "c", _batch(spark, 200), batch_id="m0")
    out = wh.cherry_pick("lab", "c", "dev", v)  # pid-0 entries: must pass
    assert out["files_added"] > 0
    df = wh.read("lab", "c")
    assert df.count() == 60
    assert df.filter(F.col("ts_day") != F.to_date("ts")).count() == 0


def test_cow_merge_aborts_on_concurrent_spec_ddl(wh3, spark, monkeypatch):
    """Review r12 #1: a copy-on-write merge whose plan was derived
    before a concurrent spec DDL must ABORT at publish (expected_parent
    anchored to the head the spec came from), never commit old-layout
    files stamped with the new pid."""
    wh = wh3
    fired = []
    real = wh._write_options

    def ddl_mid_merge(meta):
        if not fired:
            fired.append(1)
            wh.drop_partition_field("lab", "t", "days(ts)")
        return real(meta)

    monkeypatch.setattr(wh, "_write_options", ddl_mid_merge)
    with pytest.raises(RuntimeError, match="concurrent commit conflict"):
        wh.merge_upsert(
            "lab", "t",
            spark.createDataFrame(
                [(1, "zz", None)], "id int, src string, ts timestamp"
            ),
            ["id"], mode="copy-on-write",
        )
    monkeypatch.undo()
    # the table is uncorrupted: pid/layout still coherent
    df = wh.read("lab", "t")
    assert df.count() == 60
    assert df.filter(F.col("src") == "zz").count() == 0


def test_spec_report_cli(wh3, capsys):
    """`python -m ... spec-report` — per-spec live-file ledger, pure
    metadata (no SparkSession started by the command)."""
    from hands_on_iceberg_compression_spark.__main__ import main

    rc = main([
        "spec-report", "--warehouse", wh3.root,
        "--schema", "lab", "--table", "t",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "spec 0: unpartitioned" in out
    assert "spec 2: PARTITIONED BY (src, days(ts))" in out and "<- current" in out
    assert "older specs" in out


def test_metadata_only_delete_fires_per_spec(spark, tmp_path):
    """A partition-aligned DELETE is metadata-only exactly for files
    whose OWN spec proves it: current-spec files drop without a rewrite,
    pre-spec files (no src dirs) rewrite — and the result is right."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "md", "zstd", 1, properties={"snapshots": "true"})
    wh.append("lab", "md", _batch(spark, 0), batch_id="b0")  # unpartitioned
    wh.add_partition_field("lab", "md", "src")
    wh.append("lab", "md", _batch(spark, 100), batch_id="b1")  # src dirs
    out = wh.delete_where("lab", "md", "src = 's1'")
    # b1's src=s1 files dropped outright (their pv proves every row
    # matches); b0 files carry no src value and must rewrite
    assert out["files_dropped_outright"] >= 1
    assert out["files_rewritten"] >= 1
    df = wh.read("lab", "md")
    assert df.filter("src = 's1'").count() == 0
    assert df.count() == 40 - 2 * sum(1 for _i, s, _t in ROWS if s == "s1")


def test_fast_forward_carries_specs(wh3, spark):
    """Review r12 pass 3 (the carry audit): fast_forward copies the
    branch head VERBATIM — its key list must include specs/spec_id, or
    publishing a branch with spec DDL at the fork silently un-evolves
    the table and the carried entries' pids stop resolving."""
    wh = wh3
    wh.create_branch("lab", "t", "ff")
    wh.add_partition_field("lab", "t", "years(ts)", branch="ff")
    wh.append("lab", "t", _batch(spark, 300), batch_id="s0", branch="ff")
    out = wh.fast_forward("lab", "t", "ff")  # main still at the fork
    assert out["published"] == 2
    sp = wh.partition_spec("lab", "t")
    assert sp["spec_id"] == 3 and "years(ts)" in sp["transforms"]
    df = wh.read("lab", "t")
    assert df.count() == 80 and "ts_year" in df.columns
    assert df.filter(F.col("ts_year") != F.year("ts")).count() == 0
    # and appends after the publish lay out by the published spec
    wh.append("lab", "t", _batch(spark, 400), batch_id="m1")
    h = wh.head_snapshot("lab", "t")
    assert {e.get("pid", 0) for e in h["files"]} == {0, 1, 2, 3}


def test_identical_spec_ddl_both_sides_merges_as_noop(spark, tmp_path):
    """Review r12 pass 4 #1: IDENTICAL identity spec adds on both sides
    make the DDL states equal — merge_branch proceeds (adoption no-op),
    it is NOT a both-sides refusal (ids allocated identically cannot
    alias)."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "i", "zstd", 1, properties={"snapshots": "true"})
    wh.append("lab", "i", _batch(spark, 0), batch_id="b0")
    wh.create_branch("lab", "i", "tw")
    wh.add_partition_field("lab", "i", "src", branch="tw")
    wh.append("lab", "i", _batch(spark, 100), batch_id="s0", branch="tw")
    wh.add_partition_field("lab", "i", "src")  # main: the SAME add
    out = wh.merge_branch("lab", "i", "tw")
    assert out["strategy"] == "cherry_pick"
    assert wh.read("lab", "i").count() == 40
    assert wh.partition_spec("lab", "i")["transforms"] == ["src"]


def test_published_ddl_fences_second_branch(spark, tmp_path):
    """Review r12 pass 4 #2: after branch A's DDL publishes to main, a
    second branch forked BEFORE the publish that carries its own DDL
    must refuse as both-sides — main's state moved past B's fork."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "j", "zstd", 1, properties={"snapshots": "true"})
    wh.append("lab", "j", _batch(spark, 0), batch_id="b0")
    wh.create_branch("lab", "j", "a")
    wh.create_branch("lab", "j", "b")
    wh.add_partition_field("lab", "j", "src", branch="a")
    wh.append("lab", "j", _batch(spark, 100), batch_id="sa", branch="a")
    wh.merge_branch("lab", "j", "a")  # publishes A's spec DDL to main
    wh.add_partition_field("lab", "j", "days(ts)", branch="b")
    wh.append("lab", "j", _batch(spark, 200), batch_id="sb", branch="b")
    with pytest.raises(RuntimeError, match="BOTH sides"):
        wh.merge_branch("lab", "j", "b")
    assert wh.read("lab", "j").count() == 40  # main untouched by refusal
