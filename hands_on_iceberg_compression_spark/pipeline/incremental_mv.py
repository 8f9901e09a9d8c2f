"""Changelog-driven incremental materialized view (VERDICT r11 #6).

The batch-CDC twin of the streaming ``stream_upsert_latest_into_warehouse``
sink (streaming/events_stream.py:285): a KEEP-LATEST snapshot table is
maintained from a source log table's CHANGELOG pulls instead of a
micro-batch stream — the shape a training-corpus pipeline uses when the
upstream is an Iceberg-style table written by someone else's job, not a
Kafka topic.  One maintenance tick is::

    consume_changes(src, ckpt, process)       # at-least-once CDC pull
      keys   = DISTINCT key tuples in the window's changelog
      latest = keep_latest(src rows for those keys)   # delta-scoped
      merge_upsert(mv, latest + tombstones for vanished keys)

i.e. DELTA-SCOPED REFRESH: only keys the window touched are recomputed,
from the source's current state — O(changed keys) work per tick however
large the MV (the pattern Materialize/Delta's incremental MERGE
maintenance uses for arg-max views, where a delete of the current
maximum needs the surviving rows, which row-deltas alone cannot give).
The ordering is ``operators/dedup.py:keep_latest`` — THE single
keep-latest definition, so the batch query, the streaming sink, and
this maintainer can never drift from each other.

At-least-once semantics compose: a re-delivered window re-refreshes the
same keys to the same (or newer) source state — idempotent toward
convergence.  A pull that observes source commits NEWER than its window
refreshes those keys early; the next pull re-refreshes them — monotone
toward the source's keep-latest, exact once ticks drain the log (the
convergence contract ``test_incremental_mv`` pins over randomized DML).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hands_on_iceberg_compression_spark.operators.dedup import keep_latest

_DEL = "__mv_del"


def maintain_keep_latest_mv(
    wh,
    src: tuple[str, str],
    mv: tuple[str, str],
    key_cols: list[str],
    ts_col: str = "ts",
    tie_col: str = "event_id",
    checkpoint_file: str = "",
    mode: str = "merge-on-read",
    net: bool = True,
) -> dict:
    """ONE maintenance tick: pull the source changelog since the
    checkpoint and refresh exactly the touched keys in the MV.  Returns
    consume_changes' {"from", "to", "delivered"} plus "keys_refreshed".
    The MV table must exist (create_table); its first tick bootstraps
    it with a plain append.  ``mode`` is merge_upsert's write strategy —
    merge-on-read keeps each tick O(window) IO."""
    import os

    if not checkpoint_file:
        raise ValueError(
            "checkpoint_file is required — the maintainer's whole "
            "contract is checkpointed changelog pulls"
        )
    sschema, stable = src
    mschema, mtable = mv
    out = {"keys_refreshed": 0}
    # Bootstrap whenever the checkpoint is missing OR the MV has never
    # committed (ADVICE r12 medium): a crash between consume_changes'
    # checkpoint init and the bootstrap refresh leaves the checkpoint in
    # place over an empty MV — keying bootstrap off the checkpoint file
    # alone would then go incremental-only forever and pre-existing
    # source rows would never reach the MV.  The MV transitions from
    # uncommitted to committed ONLY via the full refresh/reconcile below
    # (process() skips writes on bootstrap ticks), so any crash inside a
    # bootstrap tick re-triggers bootstrap on the next one.
    bootstrap = not os.path.exists(checkpoint_file) or not wh._snapshot_versions(
        mschema, mtable
    )

    def process(ch: DataFrame) -> None:
        if bootstrap:
            # the trailing full refresh/reconcile reads the source AT or
            # AFTER this window's end, covering every key the window
            # touched — a partial per-window write here would let a
            # crash strand a half-seeded-but-committed MV that later
            # ticks treat as bootstrapped
            return
        keys = ch.select(*key_cols).distinct()
        try:
            keys = keys.localCheckpoint(eager=True)
        except Exception:
            pass  # optimization only
        n_keys = keys.count()
        out["keys_refreshed"] = n_keys
        if n_keys == 0:
            return
        cur = wh.read(sschema, stable)
        # no broadcast hint: a backfill or re-delivered window can touch
        # millions of keys, and forcing a broadcast would OOM the driver
        # on exactly the recovery path — below the auto-broadcast
        # threshold Spark broadcasts anyway (review r12 #4)
        latest = keep_latest(
            cur.join(keys, key_cols, "leftsemi"),
            key_cols, ts_col, tie_col,
        )
        gone = keys.join(latest.select(*key_cols), key_cols, "left_anti")
        batch = latest.withColumn(_DEL, F.lit(False)).unionByName(
            gone.withColumn(_DEL, F.lit(True)), allowMissingColumns=True
        )
        wh.merge_upsert(
            mschema, mtable, batch, key_cols, delete_col=_DEL, mode=mode
        )

    res = wh.consume_changes(
        sschema, stable, checkpoint_file, process, net=net
    )
    if bootstrap:
        # FIRST tick: consume_changes initialized the checkpoint at the
        # current head and delivered nothing — the changelog cannot
        # replay from before the log's first retained snapshot, so the
        # bootstrap is a FULL refresh (initial load + incremental ever
        # after, the standard MV pattern).  The refresh reads AT or
        # AFTER the checkpointed head, so anything it over-reads is
        # re-refreshed by the next window — monotone, never lossy.
        latest = keep_latest(
            wh.read(sschema, stable), key_cols, ts_col, tie_col
        )
        if not wh._snapshot_versions(mschema, mtable):
            wh.append(mschema, mtable, latest, batch_id="mv_bootstrap")
            out["keys_refreshed"] = -1  # full refresh marker
        else:
            # MV survived a lost checkpoint: RECONCILE — refresh every
            # key and tombstone MV keys the source no longer has
            gone = (
                wh.read(mschema, mtable)
                .select(*key_cols)
                .join(latest.select(*key_cols), key_cols, "left_anti")
            )
            batch = latest.withColumn(_DEL, F.lit(False)).unionByName(
                gone.withColumn(_DEL, F.lit(True)), allowMissingColumns=True
            )
            wh.merge_upsert(
                mschema, mtable, batch, key_cols, delete_col=_DEL, mode=mode
            )
            out["keys_refreshed"] = -1
    return {**res, **out}


# --- self-maintainable AGGREGATE MVs (VERDICT r12 #3) ---------------------

_APPLIED = "mv_applied_to"


def _mv_applied_version(wh, mschema: str, mtable: str) -> int:
    """Latest applied-watermark committed WITH the MV's data: walk the
    retained parent chain from the head until a commit carries the
    marker (usually the head itself; an optimize() between ticks pushes
    it one back).  -1 = nothing ever applied.  An expiry that swallowed
    the whole marked history degrades to -1 — combined with a crash
    between merge and checkpoint that re-applies a window, so retention
    must outlive the tick cadence (documented; the checkpoint pins the
    source side the same way)."""
    v = wh._latest_version(mschema, mtable)
    while v is not None:
        try:
            h = wh._load_head_light(mschema, mtable, v)
        except (FileNotFoundError, KeyError):
            return -1
        if _APPLIED in h:
            return int(h[_APPLIED])
        v = h.get("parent")
    return -1


def maintain_agg_mv(
    wh,
    src: tuple[str, str],
    mv: tuple[str, str],
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    checkpoint_file: str = "",
    mode: str = "merge-on-read",
) -> dict:
    """ONE maintenance tick of a SELF-MAINTAINABLE aggregate view —
    ``SELECT group_cols, COUNT(*) AS cnt, SUM(c) AS sum_c, COUNT(c) AS
    nn_c, SUM(c)/COUNT(c) AS avg_c ... GROUP BY group_cols`` — kept
    current purely from the source CHANGELOG: inserts add, deletes
    subtract, and NO source re-read happens per tick (the scan VERDICT
    r12 #3 orders removed; arg-max views like keep-latest stay on the
    delta-scoped refresh in ``maintain_keep_latest_mv`` because a
    delete of the current max needs the surviving rows, which count/sum
    algebra never does).  Per tick the work is O(window) + an MV-side
    join of the touched groups.

    EXACTLY-ONCE algebra under the at-least-once consumer (the part
    keep-latest never needed — its refresh is idempotent, aggregate
    DELTAS are not):

    - every MV write commits the window's max ``_commit_version`` as
      ``mv_applied_to`` IN THE SAME COMMIT (``extra_meta`` — the
      store-the-offset-with-the-data pattern), so a crash between the
      MV merge and the checkpoint write cannot double-apply: the
      redelivered window is filtered to ``_commit_version >
      mv_applied_to`` and only the unapplied suffix lands;
    - that filter is only sound when each change row carries its TRUE
      commit version, so this maintainer always pulls ``net=False``
      (net rows are tagged with their LAST contributing version — a
      net pair spanning the applied boundary would mis-filter);
      cancelling pairs cost nothing anyway: they zero out inside the
      window's one groupBy;
    - the bootstrap recompute reads ``read_snapshot(src, to)`` AT the
      version the checkpoint just landed on and stamps it, so the next
      window starts exactly where the recompute stopped.

    MV schema (created here on bootstrap via append): group_cols +
    ``cnt`` + per sum column ``sum_<c>``/``nn_<c>``/``avg_<c>`` (avg is
    derived as sum/nn in BOTH the incremental and recompute paths — one
    expression, no accumulation-order drift).  NULL group keys are
    unsupported (merge_upsert key-join semantics, same contract as CDC
    upserts); NULLs in sum columns follow SQL: they count toward
    ``cnt`` but not ``sum``/``nn``/``avg``.  Float sums inherit
    floating-point cancellation drift under heavy delete churn — use
    optimize()-triggered full refresh if exactness on doubles matters;
    int sums are exact."""
    import os

    from pyspark.sql import functions as F

    if not checkpoint_file:
        raise ValueError(
            "checkpoint_file is required — the maintainer's whole "
            "contract is checkpointed changelog pulls"
        )
    sum_cols = list(sum_cols or [])
    sschema, stable = src
    mschema, mtable = mv
    out = {"groups_refreshed": 0}
    bootstrap = not os.path.exists(checkpoint_file) or not wh._snapshot_versions(
        mschema, mtable
    )

    def agg_exprs(sign):
        """The ONE set of aggregate expressions both the incremental
        delta and the full recompute are built from."""
        exprs = [F.sum(sign).cast("bigint").alias("cnt")]
        for c in sum_cols:
            exprs.append(
                F.sum(sign * F.coalesce(F.col(c), F.lit(0))).alias(f"sum_{c}")
            )
            exprs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
                ).cast("bigint").alias(f"nn_{c}")
            )
        return exprs

    def with_avgs(df):
        for c in sum_cols:
            # NULL when the group has no non-null values — guarded
            # explicitly because the driver's vanilla session runs ANSI
            # (plain x/0 raises DIVIDE_BY_ZERO there)
            df = df.withColumn(
                f"avg_{c}",
                F.when(
                    F.col(f"nn_{c}") > 0,
                    F.col(f"sum_{c}") / F.col(f"nn_{c}"),
                ).cast("double"),
            )
        return df

    def incremental(ch) -> None:
        applied = _mv_applied_version(wh, mschema, mtable)
        ch = ch.filter(F.col("_commit_version") > F.lit(applied))
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        delta = ch.groupBy(*group_cols).agg(
            *agg_exprs(sign),
            F.max("_commit_version").alias("_win_v"),
        )
        try:
            delta = delta.localCheckpoint(eager=True)
        except Exception:
            pass  # re-drive protection is an optimization
        head = delta.agg(
            F.count("*").alias("n"), F.max("_win_v").alias("v")
        ).collect()[0]
        out["groups_refreshed"] = int(head["n"])
        if head["n"] == 0:
            return
        win_v = int(head["v"])
        delta = delta.drop("_win_v")
        cur = wh.read(mschema, mtable)
        # no broadcast hint on either side: a redelivered backfill
        # window can touch millions of groups (the keep-latest lesson)
        d, t = delta.alias("d"), cur.alias("t")
        on = [d[c].eqNullSafe(t[c]) for c in group_cols]
        from functools import reduce as _reduce

        joined = d.join(t, _reduce(lambda a, b: a & b, on), "left")
        new_cols = [F.col(f"d.{c}").alias(c) for c in group_cols]
        cnt = (
            F.coalesce(F.col("t.cnt"), F.lit(0))
            + F.col("d.cnt")
        ).cast("bigint")
        new_cols.append(cnt.alias("cnt"))
        for c in sum_cols:
            new_cols.append(
                (
                    F.coalesce(F.col(f"t.sum_{c}"), F.lit(0))
                    + F.col(f"d.sum_{c}")
                ).alias(f"sum_{c}")
            )
            new_cols.append(
                (
                    F.coalesce(F.col(f"t.nn_{c}"), F.lit(0))
                    + F.col(f"d.nn_{c}")
                ).cast("bigint").alias(f"nn_{c}")
            )
        merged = with_avgs(joined.select(*new_cols))
        batch = merged.withColumn(_DEL, F.col("cnt") == 0)
        wh.merge_upsert(
            mschema, mtable, batch, group_cols, delete_col=_DEL,
            mode=mode, extra_meta={_APPLIED: win_v},
        )

    def process(ch) -> None:
        if bootstrap:
            # the trailing recompute reads AT the checkpointed version
            # and covers this window; a partial per-window write here
            # could strand a half-seeded-but-committed MV (the
            # keep-latest crash-hole lesson, ADVICE r12)
            return
        incremental(ch)

    res = wh.consume_changes(
        sschema, stable, checkpoint_file, process, net=False
    )
    if bootstrap:
        state = with_avgs(
            wh.read_snapshot(sschema, stable, res["to"])
            .groupBy(*group_cols)
            .agg(*agg_exprs(F.lit(1)))
        )
        if not wh._snapshot_versions(mschema, mtable):
            wh.append(
                mschema, mtable, state, batch_id="mv_bootstrap",
                extra_meta={_APPLIED: res["to"]},
            )
        else:
            # MV survived a lost checkpoint: reconcile every group and
            # tombstone MV groups the recompute no longer has
            gone = (
                wh.read(mschema, mtable)
                .select(*group_cols)
                .join(state.select(*group_cols), group_cols, "left_anti")
            )
            batch = state.withColumn(_DEL, F.lit(False)).unionByName(
                gone.withColumn(_DEL, F.lit(True)),
                allowMissingColumns=True,
            )
            wh.merge_upsert(
                mschema, mtable, batch, group_cols, delete_col=_DEL,
                mode=mode, extra_meta={_APPLIED: res["to"]},
            )
        out["groups_refreshed"] = -1  # full refresh marker
    return {**res, **out}
