"""Model-based randomized test of the manifest-list segment layer.

A random sequence of log operations — append, batch replay (drop_prefix),
scoped drop+add (the partition-scoped compaction commit shape),
metadata-only manifest rewrite, snapshot expiry — runs against BOTH a
``ParquetWarehouse`` snapshot log and a trivial dict model.  After every
operation the head's materialized file list must equal the model and the
head totals must sum it; after expiry the on-disk segment files must be
exactly the kept heads' references (no leak, no over-GC); at the end the
age-gated orphan sweep must not touch any live file.  This hammers the
compositions the example-based tests can't enumerate (merge-then-drop,
replay-after-rewrite, expiry-mid-sequence, ...).  No Spark session: the
log layer is pure pyarrow + JSON.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from hands_on_iceberg_compression_spark.sources.warehouse import ParquetWarehouse


@contextlib.contextmanager
def _mk_wh():
    root = tempfile.mkdtemp(prefix="seg_model_")
    wh = ParquetWarehouse(None, root)  # spark unused by the log layer
    wh.create_table("lab", "t", "zstd", 1, properties={"snapshots": "true"})
    try:
        yield wh
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _write_file(tdir: str, batch: str, gen: str, name: str) -> str:
    d = os.path.join(tdir, "data", batch, gen)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{name}.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), p)
    return p


OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "append", "replay", "drop_add", "rewrite", "expire",
                # schema evolution interleaves with every other op:
                # metadata-only commits must never perturb the file set,
                # and the schema must track its own model exactly
                "add_col", "rename_col", "drop_col", "widen_col",
                # tags pin snapshots through expiry until dropped
                "tag", "drop_tag",
            ]
        ),
        st.integers(0, 10),
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=60, deadline=None)
@given(ops=OPS)
def test_random_op_sequences_match_model(ops):
    with _mk_wh() as wh:
        tdir = wh._tdir("lab", "t")
        model: set[str] = set()  # rel paths the head must list
        schema_model: list[dict] = []  # (name, type) the schema must match
        tags_model: dict[str, int] = {}  # live tags -> pinned version
        batches: list[str] = []
        counter = 0

        def cur_fields():
            return [{"name": f["name"], "type": f["type"]} for f in schema_model]

        def check():
            head = wh.head_snapshot("lab", "t")
            if not model:
                assert head is None or len(head["files"]) == 0
            else:
                got = {e["path"] for e in head["files"]}
                assert got == model, (got ^ model)
                assert head["total_rows"] == len(model)  # 1 row per file
            if schema_model:
                assert [
                    {"name": f["name"], "type": f["type"]}
                    for f in wh.table_schema("lab", "t")
                ] == cur_fields()
            assert wh.tags("lab", "t") == tags_model
            for v in tags_model.values():
                # every tagged snapshot must stay materializable (its head
                # AND all its segments survived whatever expiry ran)
                wh._load_snapshot("lab", "t", v)

        for op, pick in ops:
            counter += 1
            if op == "append":
                batch = f"b{counter:03d}"
                n = (pick % 3) + 1
                files = [
                    _write_file(tdir, batch, "g_0", f"f{j}") for j in range(n)
                ]
                if not schema_model:
                    schema_model.append({"name": "id", "type": "bigint"})
                wh.commit_snapshot(
                    "lab", "t", "append", add_files=files,
                    drop_prefix=os.path.join(tdir, "data", batch) + os.sep,
                    schema_fields=cur_fields(),
                )
                batches.append(batch)
                model |= {os.path.relpath(p, tdir) for p in files}
            elif op == "replay" and batches:
                batch = batches[pick % len(batches)]
                newf = _write_file(tdir, batch, f"g_{counter}", "f0")
                wh.commit_snapshot(
                    "lab", "t", "append", add_files=[newf],
                    drop_prefix=os.path.join(tdir, "data", batch) + os.sep,
                    schema_fields=cur_fields(),
                )
                model = {
                    p for p in model
                    if not p.startswith(os.path.join("data", batch) + os.sep)
                }
                model.add(os.path.relpath(newf, tdir))
            elif op in ("add_col", "rename_col", "drop_col", "widen_col"):
                if not wh._snapshot_versions("lab", "t") or not schema_model:
                    continue  # DDL needs a recorded schema
                head_before = wh._head_light("lab", "t")
                if op == "add_col":
                    name = f"c{counter:03d}"
                    wh.add_column("lab", "t", name, "int")
                    schema_model.append({"name": name, "type": "int"})
                elif op == "rename_col":
                    f = schema_model[pick % len(schema_model)]
                    new = f"r{counter:03d}"
                    wh.rename_column("lab", "t", f["name"], new)
                    f["name"] = new
                elif op == "drop_col":
                    if len(schema_model) < 2:
                        continue
                    f = schema_model[pick % len(schema_model)]
                    wh.drop_column("lab", "t", f["name"])
                    schema_model.remove(f)
                else:  # widen_col
                    cands = [f for f in schema_model if f["type"] == "int"]
                    if not cands:
                        continue
                    f = cands[pick % len(cands)]
                    wh.update_column_type("lab", "t", f["name"], "bigint")
                    f["type"] = "bigint"
                head_after = wh._head_light("lab", "t")
                # metadata-only: segment refs carried over VERBATIM
                assert head_after["segments"] == head_before.get(
                    "segments", head_after["segments"]
                )
                assert head_after["version"] == head_before["version"] + 1
            elif op == "drop_add" and model:
                victims_rel = sorted(model)[:: (pick % 3) + 1][:3]
                newf = _write_file(tdir, f"compact_{counter}", "g_0", "f0")
                wh.commit_snapshot(
                    "lab", "t", "optimize",
                    add_files=[newf],
                    drop_files=[os.path.join(tdir, r) for r in victims_rel],
                )
                batches.append(f"compact_{counter}")
                model -= set(victims_rel)
                model.add(os.path.relpath(newf, tdir))
            elif op == "tag" and wh._snapshot_versions("lab", "t"):
                name = f"t{counter:03d}"
                wh.create_tag("lab", "t", name)
                tags_model[name] = wh._latest_version("lab", "t")
            elif op == "drop_tag" and tags_model:
                name = sorted(tags_model)[pick % len(tags_model)]
                wh.drop_tag("lab", "t", name)
                del tags_model[name]
            elif op == "rewrite" and model:
                wh.rewrite_manifests("lab", "t")
            elif op == "expire" and wh._snapshot_versions("lab", "t"):
                wh.expire_snapshots("lab", "t", keep_last=(pick % 3) + 1)
                snap_dir = wh._snap_dir("lab", "t")
                kept_refs = {
                    ref["path"]
                    for v in wh._snapshot_versions("lab", "t")
                    for ref in wh._load_head_light("lab", "t", v).get(
                        "segments", []
                    )
                }
                on_disk = {
                    fn for fn in os.listdir(snap_dir) if fn.startswith("seg_")
                }
                assert on_disk == kept_refs  # exact segment GC
            check()

        # the age-gated orphan sweep must never touch a live file
        if model:
            wh.remove_orphan_files("lab", "t", older_than_s=0)
            for rel in model:
                assert os.path.isfile(os.path.join(tdir, rel)), rel
            check()
