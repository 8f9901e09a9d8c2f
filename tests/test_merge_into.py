"""Conditional MERGE INTO (VERDICT r11 #3): the Iceberg/Delta clause
surface on top of ``merge_upsert`` —

    WHEN MATCHED AND <cond> THEN DELETE
    WHEN MATCHED AND <cond> THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *
    WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE

Every round-trip below is DUCKDB-CHECKED: the same target + source rows
run through an equivalent plain-SQL resolution (anti-joins/unions — the
exact relational definition of each clause) and the post-merge table
must match row-for-row.  Both write modes (copy-on-write and
merge-on-read) are exercised, plus branches, clause precedence
(delete beats update), NULL-condition semantics (NULL = clause does not
fire), and the source-extra-columns CDC shape.
"""

from __future__ import annotations

import duckdb
import pytest

from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
)

TARGET = [
    (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40), (5, "e", 50),
]
# op: U/D; ts drives the freshness condition; id 9 is unmatched
SOURCE = [
    (1, "A", 5, "U"),    # matched, stale  -> kept as-is under freshness
    (2, "B", 99, "U"),   # matched, fresh  -> updates
    (3, "C", 99, "D"),   # matched tombstone -> deletes
    (5, "E", 99, None),  # matched, fresh, NULL op -> delete clause no-fire
    (9, "I", 99, "U"),   # not matched -> inserts
]


def _mk(spark, tmp_path, name="t"):
    wh = ParquetWarehouse(spark, str(tmp_path / f"wh_{name}"))
    wh.create_table("lab", name, "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", name,
        spark.createDataFrame(TARGET, "id int, v string, ts int"),
        batch_id="b0",
    )
    return wh


def _src(spark):
    return spark.createDataFrame(SOURCE, "id int, v string, ts int, op string")


def _duck(matched_condition=None, matched_delete=None,
          not_matched_insert=True, not_matched_by_source_delete=None,
          matched_update=True):
    """Plain-SQL clause resolution over the same rows."""
    con = duckdb.connect()
    tv = ", ".join(f"({i}, '{v}', {ts})" for i, v, ts in TARGET)
    sv = ", ".join(
        f"({i}, '{v}', {ts}, " + ("NULL" if op is None else f"'{op}'") + ")"
        for i, v, ts, op in SOURCE
    )
    con.execute(f"CREATE TABLE t(id INT, v VARCHAR, ts INT); INSERT INTO t VALUES {tv}")
    con.execute(
        f"CREATE TABLE s(id INT, v VARCHAR, ts INT, op VARCHAR); INSERT INTO s VALUES {sv}"
    )
    # procedural clause resolution: each condition is evaluated by
    # DUCKDB itself (per row pair, via _eval) so the oracle's SQL
    # semantics — NULL never fires a clause, delete beats update — come
    # from a second engine, not from re-implementing them in Python
    rows = con.execute(
        "SELECT t.id, t.v, t.ts, s.id, s.v, s.ts, s.op "
        "FROM t LEFT JOIN s ON t.id = s.id"
    ).fetchall()
    out = []
    for tid, tv_, tts, sid, sv_, sts, sop in rows:
        if sid is None:  # not matched by source
            fire = not_matched_by_source_delete is True or (
                isinstance(not_matched_by_source_delete, str)
                and _eval(
                    con, not_matched_by_source_delete,
                    tid, tv_, tts, None, None, None,
                )
            )
            if not fire:
                out.append((tid, tv_, tts))
            continue
        # matched: delete beats update; neither firing keeps the target row
        if matched_delete and _eval(con, matched_delete, tid, tv_, tts, sv_, sts, sop):
            continue
        upd = matched_update and (
            matched_condition is None
            or _eval(con, matched_condition, tid, tv_, tts, sv_, sts, sop)
        )
        out.append((sid, sv_, sts) if upd else (tid, tv_, tts))
    if not_matched_insert:
        out += [
            (i, v, ts)
            for i, v, ts, _op in SOURCE
            if all(i != t[0] for t in TARGET)
        ]
    return sorted(out)


def _eval(con, cond, tid, tv_, tts, sv_, sts, sop):
    """Evaluate one t./s. condition for one row pair in DuckDB."""

    def lit(x):
        if x is None:
            return "NULL"
        return f"'{x}'" if isinstance(x, str) else str(x)

    q = (
        "SELECT COALESCE(("
        + cond
        + "), false) FROM (SELECT "
        + f"{lit(tid)} AS id, {lit(tv_)} AS v, {lit(tts)} AS ts) t, "
        + f"(SELECT {lit(tid)} AS id, {lit(sv_)} AS v, {lit(sts)} AS ts, "
        + f"{lit(sop)} AS op) s"
    )
    return bool(con.execute(q).fetchone()[0])


def _table_rows(wh, name="t"):
    return sorted(
        (r["id"], r["v"], r["ts"]) for r in wh.read("lab", name).collect()
    )


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
def test_cdc_freshness_and_tombstones(spark, tmp_path, mode):
    """The canonical CDC shape: freshness-guarded updates + tombstone
    deletes + inserts, source carrying extra metadata columns."""
    wh = _mk(spark, tmp_path, mode[:4])
    out = wh.merge_into(
        "lab", mode[:4], _src(spark), ["id"],
        matched_condition="s.ts > t.ts",
        matched_delete="s.op = 'D'",
        mode=mode,
    )
    assert out["matched_deleted"] == 1
    got = _table_rows(wh, mode[:4])
    assert got == _duck(matched_condition="s.ts > t.ts", matched_delete="s.op = 'D'")
    # the stale row kept its ORIGINAL image; the NULL-op row updated
    # (freshness fired) but did NOT delete (NULL clause never fires)
    assert (1, "a", 10) in got and (5, "E", 99) in got
    # extra source columns (op) never landed
    assert wh.read("lab", mode[:4]).columns == ["id", "v", "ts"]


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
def test_not_matched_by_source_delete(spark, tmp_path, mode):
    wh = _mk(spark, tmp_path, f"n{mode[:3]}")
    name = f"n{mode[:3]}"
    out = wh.merge_into(
        "lab", name, _src(spark), ["id"],
        matched_update=False, not_matched_insert=False,
        not_matched_by_source_delete="t.ts >= 40",
        mode=mode,
    )
    assert out["not_matched_by_source_deleted"] == 1  # id 4 (ts 40)
    got = _table_rows(wh, name)
    assert got == _duck(
        matched_update=False, not_matched_insert=False,
        not_matched_by_source_delete="t.ts >= 40",
    )
    assert all(t[0] != 4 for t in got) and any(t[0] == 1 for t in got)


def test_unconditional_full_sync(spark, tmp_path):
    """matched update + insert + NMBS True == make the table equal the
    source projection (classic full-sync)."""
    wh = _mk(spark, tmp_path, "fs")
    src = spark.createDataFrame(
        [(2, "B2", 200), (9, "I", 900)], "id int, v string, ts int"
    )
    wh.merge_into(
        "lab", "fs", src, ["id"], not_matched_by_source_delete=True,
    )
    assert _table_rows(wh, "fs") == [(2, "B2", 200), (9, "I", 900)]


def test_clause_precedence_delete_beats_update(spark, tmp_path):
    wh = _mk(spark, tmp_path, "pr")
    src = spark.createDataFrame(
        [(1, "X", 999, "D")], "id int, v string, ts int, op string"
    )
    out = wh.merge_into(
        "lab", "pr", src, ["id"],
        matched_condition="s.ts > t.ts",  # would fire...
        matched_delete="s.op = 'D'",      # ...but delete wins
    )
    assert out["matched_deleted"] == 1 and out["upserts"] == 0
    assert all(t[0] != 1 for t in _table_rows(wh, "pr"))


def test_merge_into_on_branch(spark, tmp_path):
    wh = _mk(spark, tmp_path, "br")
    wh.create_branch("lab", "br", "stage")
    wh.merge_into(
        "lab", "br", _src(spark), ["id"],
        matched_condition="s.ts > t.ts", matched_delete="s.op = 'D'",
        mode="merge-on-read", branch="stage",
    )
    # main untouched until publish
    assert _table_rows(wh, "br") == sorted(TARGET)
    wh.fast_forward("lab", "br", "stage")
    assert _table_rows(wh, "br") == _duck(
        matched_condition="s.ts > t.ts", matched_delete="s.op = 'D'"
    )


def test_noop_and_guards(spark, tmp_path):
    wh = _mk(spark, tmp_path, "ng")
    v0 = wh._latest_version("lab", "ng")
    out = wh.merge_into(
        "lab", "ng",
        spark.createDataFrame([(1, "A", 1, "U")], "id int, v string, ts int, op string"),
        ["id"], matched_condition="s.ts > t.ts", not_matched_insert=False,
    )
    assert out["upserts"] == 0 and out["deletes"] == 0
    assert wh._latest_version("lab", "ng") == v0  # no empty commit
    with pytest.raises(ValueError, match="no-op"):
        wh.merge_into(
            "lab", "ng", _src(spark), ["id"],
            matched_update=False, not_matched_insert=False,
        )
    with pytest.raises(ValueError, match="no key column"):
        wh.merge_into("lab", "ng", _src(spark), ["nope"])
    with pytest.raises(ValueError, match="duplicate keys"):
        wh.merge_into(
            "lab", "ng",
            spark.createDataFrame(
                [(7, "x", 1, "U"), (7, "y", 2, "U")],
                "id int, v string, ts int, op string",
            ),
            ["id"],
        )


def test_pruned_discovery_equals_full_and_coercion_edge(spark, tmp_path):
    """Review r12 pass 2 #1/#4: the envelope-pruned discovery join must
    equal the full-scan result when pruning actually FIRES (clustered
    multi-file table), and a source whose key dtype differs from the
    recorded type must SKIP pruning — the join compares under Spark's
    coercion (string '007' == int 7) while bounds compare under the
    recorded type, so a mismatched envelope could prune a matching file."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("lab", "pr", "zstd", 1, properties={"snapshots": "true"})
    # clustered key ranges, one file per batch -> the envelope prunes
    for b in range(5):
        wh.append(
            "lab", "pr",
            spark.createDataFrame(
                [(b * 100 + i, f"v{b}", b) for i in range(100)],
                "id int, v string, ts int",
            ).coalesce(1),
            batch_id=f"b{b}",
        )
    # sanity: the envelope for keys in [210, 240] keeps a strict subset
    kept, total = wh.prune_files("lab", "pr", {"id": (210, 240)})
    assert 0 < len(kept) < total
    src = spark.createDataFrame(
        [(210, "X", 99, "U"), (240, None, 99, "D"), (9999, "I", 99, "U")],
        "id int, v string, ts int, op string",
    )
    out = wh.merge_into(
        "lab", "pr", src, ["id"],
        matched_condition="s.ts > t.ts", matched_delete="s.op = 'D'",
    )
    assert out["matched_deleted"] == 1
    rows = {r["id"]: (r["v"], r["ts"]) for r in wh.read("lab", "pr").collect()}
    assert rows[210] == ("X", 99) and 240 not in rows and rows[9999] == ("I", 99)
    assert len(rows) == 500  # 500 - 1 delete + 1 insert
    # coercion edge: STRING target key '007' vs INT source key 7 —
    # under Spark's implicit coercion the join would match, but no
    # single key representation then serves both the keep-side
    # anti-join (needs '007') and the landing rows (int into a string
    # table); merge_into REFUSES and demands an explicit cast
    wh.create_table("lab", "co", "zstd", 1, properties={"snapshots": "true"})
    wh.append(
        "lab", "co",
        spark.createDataFrame(
            [("007", "old", 0), ("900", "keep", 0)], "k string, v string, ts int"
        ),
        batch_id="b0",
    )
    with pytest.raises(ValueError, match="key dtype mismatch"):
        wh.merge_into(
            "lab", "co",
            spark.createDataFrame([(7, 9, "D")], "k int, ts int, op string"),
            ["k"],
            matched_delete="s.op = 'D'", not_matched_insert=False,
        )
    # explicitly cast keys: exact string match semantics ('7' != '007')
    out = wh.merge_into(
        "lab", "co",
        spark.createDataFrame(
            [("007", 9, "D")], "k string, ts int, op string"
        ),
        ["k"],
        matched_delete="s.op = 'D'", not_matched_insert=False,
    )
    assert out["matched_deleted"] == 1
    assert [r["k"] for r in wh.read("lab", "co").collect()] == ["900"]


def test_narrower_source_carries_target_columns(spark, tmp_path):
    """ADVICE r12: a source omitting table columns must NOT NULL-clobber
    them on MATCHED UPDATE rows — omitted columns carry the target's
    current value (UPDATE SET only-the-source-columns), while INSERT
    rows still NULL-fill them (no target row to carry from)."""
    wh = _mk(spark, tmp_path, "nw")
    # source has only (id, ts): v is omitted
    src = spark.createDataFrame([(2, 999), (9, 900)], "id int, ts int")
    out = wh.merge_into("lab", "nw", src, ["id"])
    assert out["upserts"] == 2
    rows = {r["id"]: (r["v"], r["ts"]) for r in wh.read("lab", "nw").collect()}
    assert rows[2] == ("b", 999)      # v carried, ts updated
    assert rows[9] == (None, 900)     # insert: NULL-fill for omitted v
    assert rows[1] == ("a", 10)       # untouched
    # conditional flavor: the carried column also survives a
    # freshness-guarded update and a merge-on-read write mode
    src2 = spark.createDataFrame([(2, 1), (3, 888)], "id int, ts int")
    wh.merge_into(
        "lab", "nw", src2, ["id"],
        matched_condition="s.ts > t.ts", mode="merge-on-read",
    )
    rows = {r["id"]: (r["v"], r["ts"]) for r in wh.read("lab", "nw").collect()}
    assert rows[2] == ("b", 999)      # stale: kept entirely
    assert rows[3] == ("c", 888)      # fresh: v carried, ts updated


def test_not_matched_insert_condition(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT — conditional inserts
    (only fresh-enough unmatched rows land; NULL condition no-fires)."""
    wh = _mk(spark, tmp_path, "ni")
    src = spark.createDataFrame(
        [(9, "I", 99, "U"), (10, "J", 1, "U"), (11, "K", None, "U")],
        "id int, v string, ts int, op string",
    )
    out = wh.merge_into(
        "lab", "ni", src, ["id"],
        matched_update=False,
        not_matched_condition="s.ts > 50",
    )
    assert out["upserts"] == 1
    got = _table_rows(wh, "ni")
    assert (9, "I", 99) in got
    assert all(t[0] not in (10, 11) for t in got)  # stale + NULL: no-fire
    assert len(got) == len(TARGET) + 1
