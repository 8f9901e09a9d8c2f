"""Write-audit-publish quality gates (r18) — the workflow snapshot
BRANCHES exist for (Iceberg WAP / Nessie promotion): stage writes on a
branch, AUDIT the staged state with declarative checks, and publish to
main only when every check passes.  A training-data pipeline's last
line of defense: a bad ingest (nulled keys, duplicated documents, a
half-empty extract) lands on the branch, fails the audit, and main
never sees it.

Checks are dicts (unknown kinds and unknown keys refuse up front — the
silent-no-op posture every r18 config surface shares)::

    {"kind": "not_null", "cols": ["doc_id", "text"]}
    {"kind": "unique", "cols": ["doc_id"]}
    {"kind": "expression", "sql": "quality_score >= 0", "name": "q>=0"}
    {"kind": "row_count_delta", "min": 0, "max": 1_000_000}

- ``not_null``: zero NULLs in each listed column.
- ``unique``: no duplicate tuples over the listed columns.
- ``expression``: zero rows where the SQL predicate is NOT satisfied
  (NULL predicate counts as a violation — an audit must not pass rows
  it cannot prove).
- ``row_count_delta``: branch row count minus MAIN's current row count
  within [min, max] — catches accidental truncations (min) and
  explosions (max) before they publish; either bound optional.

All row-shaped checks run in ONE aggregate pass over the audited state
(conditional counts), plus one groupBy job per ``unique`` check; counts
come from ``count_rows``'s metadata fast path when provable.  The
audited read is the branch's delete-APPLIED current state — exactly
what a publish would make visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CHECK_KEYS = {
    "not_null": {"kind", "cols", "name"},
    "unique": {"kind", "cols", "name"},
    "expression": {"kind", "sql", "name"},
    "row_count_delta": {"kind", "min", "max", "name"},
}


class AuditFailed(ValueError):
    """Raised by ``publish_if_green`` when any check fails; carries the
    full audit result on ``.audit``."""

    def __init__(self, msg: str, audit: dict):
        super().__init__(msg)
        self.audit = audit


def _validate_checks(checks: list[dict]) -> None:
    if not isinstance(checks, list) or not checks:
        raise ValueError("checks must be a non-empty list of check dicts")
    for i, c in enumerate(checks):
        kind = c.get("kind") if isinstance(c, dict) else None
        if kind not in _CHECK_KEYS:
            raise ValueError(
                f"check {i}: unknown kind {kind!r} — supported: "
                f"{sorted(_CHECK_KEYS)}"
            )
        unknown = set(c) - _CHECK_KEYS[kind]
        if unknown:
            raise ValueError(
                f"check {i} ({kind}): unknown key(s) {sorted(unknown)} — "
                f"allowed: {sorted(_CHECK_KEYS[kind])}"
            )
        if kind in ("not_null", "unique") and not c.get("cols"):
            raise ValueError(f"check {i} ({kind}): 'cols' is required")
        if kind == "expression" and not c.get("sql"):
            raise ValueError(f"check {i} (expression): 'sql' is required")
        if kind == "row_count_delta" and (
            c.get("min") is None and c.get("max") is None
        ):
            raise ValueError(
                f"check {i} (row_count_delta): at least one of min/max "
                "is required — boundless bounds never fail"
            )


def audit_table(
    wh, schema: str, table: str, checks: list[dict],
    branch: str = "main",
) -> dict:
    """Run every check against the CURRENT (delete-applied) state of
    ``schema.table`` on ``branch``.  Returns {"passed": bool,
    "rows": audited row count, "checks": [{"name", "kind", "passed",
    "violations" | "delta"}...]} — every check always runs (a failing
    first check must not hide a failing third)."""
    _validate_checks(checks)
    df = wh.read(schema, table, branch)
    missing = [
        c
        for ch in checks
        for c in ch.get("cols", [])
        if c not in df.columns
    ]
    if missing:
        raise ValueError(
            f"check column(s) {missing} not in {schema}.{table}"
        )
    results: list[dict] = []
    # ONE aggregate pass for every row-shaped violation count
    agg_exprs = [F.count(F.lit(1)).alias("__rows")]
    agg_slots: list[tuple[int, str]] = []
    for i, ch in enumerate(checks):
        if ch["kind"] == "not_null":
            for c in ch["cols"]:
                agg_exprs.append(
                    F.sum(
                        F.when(F.col(c).isNull(), 1).otherwise(0)
                    ).alias(f"__nn_{i}_{c}")
                )
        elif ch["kind"] == "expression":
            # NOT(coalesce(pred, false)): a NULL predicate is a
            # violation — the audit must not pass rows it cannot prove
            agg_exprs.append(
                F.sum(
                    F.when(
                        ~F.coalesce(F.expr(ch["sql"]), F.lit(False)), 1
                    ).otherwise(0)
                ).alias(f"__ex_{i}")
            )
            agg_slots.append((i, f"__ex_{i}"))
    row = df.agg(*agg_exprs).collect()[0]
    n_rows = int(row["__rows"])
    for i, ch in enumerate(checks):
        kind = ch["kind"]
        name = ch.get("name", f"{kind}:{i}")
        if kind == "not_null":
            per_col = {
                c: int(row[f"__nn_{i}_{c}"]) for c in ch["cols"]
            }
            v = sum(per_col.values())
            results.append({
                "name": name, "kind": kind, "violations": v,
                "per_col": per_col, "passed": v == 0,
            })
        elif kind == "expression":
            v = int(row[f"__ex_{i}"])
            results.append({
                "name": name, "kind": kind, "violations": v,
                "passed": v == 0,
            })
        elif kind == "unique":
            dup = (
                df.groupBy(*ch["cols"])
                .count()
                .filter(F.col("count") > 1)
                .agg(
                    F.count(F.lit(1)).alias("keys"),
                    F.coalesce(
                        F.sum(F.col("count") - 1), F.lit(0)
                    ).alias("extra"),
                )
                .collect()[0]
            )
            v = int(dup["extra"])
            results.append({
                "name": name, "kind": kind, "violations": v,
                "duplicate_keys": int(dup["keys"]), "passed": v == 0,
            })
        else:  # row_count_delta
            main_n = (
                wh.count_rows(schema, table)
                if wh._latest_version(schema, table) is not None
                else 0
            )
            delta = n_rows - (main_n or 0)
            lo, hi = ch.get("min"), ch.get("max")
            ok = (lo is None or delta >= lo) and (hi is None or delta <= hi)
            results.append({
                "name": name, "kind": kind, "delta": delta,
                "main_rows": main_n, "passed": ok,
            })
    return {
        "passed": all(r["passed"] for r in results),
        "rows": n_rows,
        "checks": results,
    }


def publish_if_green(
    wh, schema: str, table: str, branch: str, checks: list[dict],
) -> dict:
    """The WAP gate: audit the branch, then publish it to main
    (``merge_branch`` — fast_forward at the fork, oldest-first
    cherry-pick after main moved) ONLY when every check passed; a red
    audit raises ``AuditFailed`` carrying the full result and main is
    untouched.  The audit reads the branch's delete-applied state —
    exactly what publishing would make visible.  Note the standard WAP
    caveat: a commit racing onto the branch between audit and publish
    publishes un-audited; stop the branch's writer before gating (the
    audit is a gate, not a lock)."""
    res = audit_table(wh, schema, table, checks, branch=branch)
    if not res["passed"]:
        bad = [c["name"] for c in res["checks"] if not c["passed"]]
        raise AuditFailed(
            f"audit of {schema}.{table}@{branch} FAILED check(s) "
            f"{bad} — main untouched; fix the branch and re-gate",
            res,
        )
    out = wh.merge_branch(schema, table, branch)
    return {"audit": res, "publish": out}
