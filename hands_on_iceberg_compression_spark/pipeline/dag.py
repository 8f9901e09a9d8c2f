"""Declarative MV pipeline drains (r18) — the operational face of the
MV-over-MV chaining contract (incremental_mv module docstring): a
pipeline is a LIST OF STAGES in topological order (parents before
children), each stage one maintainer tick.  One ``drain_pipeline`` call
is one pass over the DAG; after the last source change, one pass makes
the whole chain exact (the chaining contract's drain), and passes
between changes are cheap (consume_changes' zero-job empty-window
path).  Cron ``mv-drain`` next to ``mv-report`` and a multi-stage
pipeline stays fresh and observable with no bespoke driver code —
chains, diamonds, and CDC mirrors all express as the same JSON.

Stage spec (a dict; unknown kinds AND unknown keys refuse up front —
the retain_checkpoints silent-no-op lesson: a typo'd key must never
silently change what a pipeline maintains)::

    {"kind": "keep-latest", "src": "lab.events", "mv": "lab.latest",
     "keys": ["k"], "checkpoint": "/ckpts/latest.json",
     "ts_col": "ts", "tie_col": "event_id",            # optional
     "maintenance_policy": {"max_pending_delete_entries": 8},
     "value_cols": ["a"], ...}

Kinds map 1:1 onto the maintainers: ``keep-latest``/``topn``/``agg``/
``join`` (pipeline/incremental_mv.py) and ``cdc-apply``
(pipeline/cdc_apply.py); each kind accepts exactly its maintainer's
keyword surface (see _KIND_SPECS).  ``join`` takes ``right`` +
``checkpoint_right``; ``cdc-apply``'s ``mv`` is the MERGE target.
``audit-publish`` (pipeline/audit.py) gates a staged BRANCH behind
declarative quality checks and merges it to main only when green —
so a pipeline can stage (cdc-apply with ``tgt_branch``), maintain, and
promote in one cron'd drain; a red audit raises ``AuditFailed`` and
aborts the pass with main untouched (earlier stages' commits stand —
every tick is an atomic commit, so the partial pass is consistent).
"""

from __future__ import annotations

from hands_on_iceberg_compression_spark.pipeline.audit import (
    _validate_checks,
    publish_if_green,
)
from hands_on_iceberg_compression_spark.pipeline.cdc_apply import (
    merge_into_batched,
)
from hands_on_iceberg_compression_spark.pipeline.incremental_mv import (
    maintain_agg_mv,
    maintain_join_mv,
    maintain_keep_latest_mv,
    maintain_topn_mv,
)

# per kind: (required keys, optional keys) — beyond the shared ones
_MAINTAIN_REQUIRED = {"kind", "src", "mv", "keys", "checkpoint"}
_REQ_BY_KIND = {"audit-publish": {"kind", "table", "branch", "checks"}}
# shared optional keys are PER KIND (ADVICE r18): every maintainer takes
# mode/src_branch/maintenance_policy, but ts_col/tie_col only where the
# maintainer actually consumes them — drain_pipeline never passes ts_col
# to maintain_agg_mv or maintain_topn_mv, so accepting it would validate
# a key that silently does nothing (the exact class the validator closes)
_BASE_OPT = {"name", "mode", "src_branch", "maintenance_policy"}
_OPT_BY_KIND = {
    "keep-latest": _BASE_OPT | {"ts_col", "tie_col"},
    "topn": _BASE_OPT | {"tie_col"},
    "agg": _BASE_OPT,
    "join": _BASE_OPT | {"ts_col", "tie_col"},
    "cdc-apply": _BASE_OPT | {"ts_col", "tie_col"},
}
_KIND_SPECS: dict[str, set[str]] = {
    "keep-latest": {
        "net", "prune_source", "keys_only", "evolve_schema", "value_cols",
    },
    "topn": {
        "n", "order_col", "descending", "prune_source", "keys_only",
        "evolve_schema", "value_cols",
    },
    "agg": {"sum_cols"},
    "join": {
        "right", "checkpoint_right", "how", "right_key_cols",
        "right_branch", "prune_source", "keys_only", "evolve_schema",
        "left_value_cols", "right_value_cols",
    },
    "cdc-apply": {
        "max_lag_commits", "min_batch_rows", "matched_condition",
        "keys_only", "tgt_branch", "evolve_schema",
    },
    # the WAP gate is NOT a maintainer: its own required-key shape,
    # no shared maintainer keys beyond "name"
    "audit-publish": set(),
}


def _tbl(dotted: str) -> tuple[str, str]:
    if "." not in dotted:
        raise ValueError(
            f"table reference {dotted!r} must be 'schema.table'"
        )
    a, b = dotted.split(".", 1)
    return a, b


def validate_pipeline(stages: list[dict]) -> None:
    """Refuse malformed pipelines BEFORE any stage runs: unknown kinds,
    unknown/missing keys, non-topological self-references.  Running
    half a pipeline before discovering a stage-7 typo would leave the
    DAG in a consistent-but-surprising mid-drain state — and a typo'd
    optional key silently changing semantics is the exact failure mode
    the policy/retention refusals closed."""
    if not isinstance(stages, list) or not stages:
        raise ValueError("pipeline must be a non-empty list of stages")
    seen_mv: dict[str, int] = {}
    for i, st in enumerate(stages):
        if not isinstance(st, dict):
            raise ValueError(f"stage {i} is not a dict")
        kind = st.get("kind")
        if kind not in _KIND_SPECS:
            raise ValueError(
                f"stage {i} ({st.get('name', '?')}): unknown kind "
                f"{kind!r} — supported: {sorted(_KIND_SPECS)}"
            )
        required = _REQ_BY_KIND.get(kind, _MAINTAIN_REQUIRED)
        shared = {"name"} if kind in _REQ_BY_KIND else _OPT_BY_KIND[kind]
        allowed = required | shared | _KIND_SPECS[kind]
        unknown = set(st) - allowed
        if unknown:
            raise ValueError(
                f"stage {i} ({st.get('name', kind)}): unknown key(s) "
                f"{sorted(unknown)} for kind {kind!r} — allowed: "
                f"{sorted(allowed)}"
            )
        missing = required - set(st)
        if kind == "join":
            missing |= {"right", "checkpoint_right"} - set(st)
        if kind == "topn" and "order_col" not in st:
            missing.add("order_col")
        if missing:
            raise ValueError(
                f"stage {i} ({st.get('name', kind)}): missing required "
                f"key(s) {sorted(missing)}"
            )
        if kind == "audit-publish":
            # the inner check list validates NOW — a check typo in
            # stage 7 must refuse before stage 1 runs
            _validate_checks(st["checks"])
            continue
        # self-reference refusal (VERDICT r18 #3 — the docstring's
        # promise, now enforced): a stage maintaining an MV FROM itself
        # would pass every key check and enter a self-feeding loop —
        # each tick's commit becomes the next tick's changelog window
        if st["src"] == st["mv"]:
            raise ValueError(
                f"stage {i} ({st.get('name', kind)}): src == mv "
                f"({st['mv']!r}) — a self-feeding stage never converges"
            )
        if kind == "join" and st.get("right") == st["mv"]:
            raise ValueError(
                f"stage {i} ({st.get('name', kind)}): right == mv "
                f"({st['mv']!r}) — a self-feeding stage never converges"
            )
        # two stages maintaining the SAME mv is almost certainly a
        # pipeline typo — their merges would interleave and neither
        # converges to its own definition
        if st["mv"] in seen_mv:
            raise ValueError(
                f"stage {i} ({st.get('name', kind)}): mv {st['mv']!r} "
                f"is already maintained by stage {seen_mv[st['mv']]} — "
                "one pipeline must not maintain the same table twice"
            )
        seen_mv[st["mv"]] = i


def drain_pipeline(wh, stages: list[dict]) -> list[dict]:
    """ONE pass over the pipeline: tick each stage in the given
    (topological) order; returns one result dict per stage — the
    maintainer's result plus {"stage": name, "kind": kind}.  The whole
    pipeline validates before the first tick.  A stage that raises
    aborts the pass (earlier stages' commits stand — every tick is an
    ordinary atomic commit, so a partial pass is just a consistent
    mid-drain state; fix the stage and re-drain)."""
    validate_pipeline(stages)
    out = []
    for st in stages:
        kind = st["kind"]
        if kind == "audit-publish":
            name = st.get("name", f"{kind}:{st['table']}")
            res = publish_if_green(
                wh, *_tbl(st["table"]), st["branch"], st["checks"]
            )
            out.append({"stage": name, "kind": kind, **res})
            continue
        name = st.get("name", f"{kind}:{st['mv']}")
        shared = dict(
            ts_col=st.get("ts_col", "ts"),
            tie_col=st.get("tie_col", "event_id"),
        )
        opt = {
            k: st[k]
            for k in (
                "mode", "src_branch", "maintenance_policy", "net",
                "prune_source", "keys_only", "evolve_schema",
                "value_cols",
            )
            if k in st
        }
        if kind == "keep-latest":
            res = maintain_keep_latest_mv(
                wh, _tbl(st["src"]), _tbl(st["mv"]), list(st["keys"]),
                checkpoint_file=st["checkpoint"], **shared, **opt,
            )
        elif kind == "topn":
            res = maintain_topn_mv(
                wh, _tbl(st["src"]), _tbl(st["mv"]), list(st["keys"]),
                int(st.get("n", 10)), order_col=st["order_col"],
                tie_col=shared["tie_col"],
                checkpoint_file=st["checkpoint"],
                descending=bool(st.get("descending", True)),
                **{k: v for k, v in opt.items() if k != "net"},
            )
        elif kind == "agg":
            res = maintain_agg_mv(
                wh, _tbl(st["src"]), _tbl(st["mv"]), list(st["keys"]),
                sum_cols=list(st.get("sum_cols", [])),
                checkpoint_file=st["checkpoint"],
                **{
                    k: v
                    for k, v in opt.items()
                    if k in ("mode", "src_branch", "maintenance_policy")
                },
            )
        elif kind == "join":
            res = maintain_join_mv(
                wh, _tbl(st["src"]), _tbl(st["right"]), _tbl(st["mv"]),
                list(st["keys"]), **shared,
                checkpoint_left=st["checkpoint"],
                checkpoint_right=st["checkpoint_right"],
                how=st.get("how", "inner"),
                right_key_cols=st.get("right_key_cols"),
                left_branch=st.get("src_branch", "main"),
                right_branch=st.get("right_branch", "main"),
                left_value_cols=st.get("left_value_cols"),
                right_value_cols=st.get("right_value_cols"),
                **{
                    k: v
                    for k, v in opt.items()
                    if k in (
                        "mode", "maintenance_policy", "prune_source",
                        "keys_only", "evolve_schema",
                    )
                },
            )
        else:  # cdc-apply (validated above)
            if opt.get("mode") == "auto":
                # the mirror's size is unbounded — size-based auto
                # resolution belongs to the MV maintainers (the mv-tick
                # coercion, ADVICE r17)
                opt["mode"] = "merge-on-read"
            res = merge_into_batched(
                wh, _tbl(st["src"]), _tbl(st["mv"]), list(st["keys"]),
                st["checkpoint"], **shared,
                max_lag_commits=int(st.get("max_lag_commits", 1)),
                min_batch_rows=int(st.get("min_batch_rows", 0)),
                matched_condition=st.get("matched_condition"),
                tgt_branch=st.get("tgt_branch", "main"),
                **{
                    k: v
                    for k, v in opt.items()
                    if k in (
                        "mode", "src_branch", "maintenance_policy",
                        "keys_only", "evolve_schema",
                    )
                },
            )
        # stack-health surface (VERDICT r18 #6): the zero-job census of
        # the table this stage OWNS plus whether its policy fired, so a
        # cron'd drain's JSON lines show delete-stack health without a
        # separate mv-report call
        census = wh.pending_delete_stats(
            *_tbl(st["mv"]),
            branch=st.get("tgt_branch", "main")
            if kind == "cdc-apply"
            else "main",
        )
        out.append({
            "stage": name, "kind": kind, **res,
            "pending_deletes": census,
            "fold_fired": "auto_fold" in res,
        })
    return out
