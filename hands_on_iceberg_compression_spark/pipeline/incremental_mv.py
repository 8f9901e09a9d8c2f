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
