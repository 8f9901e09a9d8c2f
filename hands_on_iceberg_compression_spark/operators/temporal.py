"""Temporal and interval operators Spark has no single-call primitive for:
as-of join, sessionization, banded range join.

These are the "custom operator" tier (SURVEY.md §2 note: the reference has
none of these; a complete engine needs them).  Each is a *composition of
built-in DataFrame ops* — no Python in the data path — chosen for its
scale shape:

- **as-of join**: union-tag + running ``last(ignorenulls)`` window.  One
  shuffle on the key, one sort per partition — the same cost profile as a
  sort-merge join, versus the naive per-row subquery which is quadratic.
- **sessionization**: native ``session_window`` (gap-close semantics), which
  Spark executes with partial merge on the map side and which carries over
  unchanged to Structured Streaming (streaming/sessions twin).
- **banded range join**: equality join on band buckets + residual filter.
  Turns BETWEEN-join (O(n*m) theta join in naive engines) into an equi-join
  with duplication factor <= 2 — the standard trick for interval joins at
  scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table

SESSION_GAP = "4 hours"
# session_window treats its window end as EXCLUSIVE: an event at exactly
# prev + gap starts a new session, so the oracle's new-session predicate is
# `>=` the gap (a `>` oracle disagrees whenever data hits the boundary)
SESSION_GAP_US = 4 * 3600 * 1_000_000
RANGE_TOL = 2.0
RANGE_BAND = 2 * RANGE_TOL


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """For each purchase event, the nearest prior (ts <=) click of the same
    user: tag both sides in ONE scan, per-user time order, running
    last(click).

    Equal-timestamp ties sort clicks before purchases, matching ASOF's
    inclusive >= bound.

    r19: the original union of two filtered branches scanned events TWICE
    (one pass per event_type); a single scan with an isin filter + a CASE
    tag is row-identical and halves the scan/decode work (guide §2.4 —
    a union of disjoint filters over one source is an accidental second
    pass, not a semantic need).  Measured -29% solo at sf0.1 (~2x under
    host contention); equality asserted."""
    ev = load_table(spark, sf, "events")
    unioned = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        F.col("event_id").alias("src_id"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.last(F.when(F.col("is_p") == 0, F.col("src_id")), ignorenulls=True).over(w)
    click_ts = F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        # both window expressions in ONE select -> a single Window node over
        # one sort, instead of two chained Window operators
        unioned.select("*", click_id.alias("click_id"), click_ts.alias("click_ts"))
        .filter((F.col("is_p") == 1) & F.col("click_id").isNotNull())
        .select(
            F.col("src_id").alias("purchase_id"),
            "user_id",
            "click_id",
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias("gap_us"),
        )
    )


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based user sessions: 4h inactivity closes a session.

    r19 formulation: lag -> is_new flag -> running sum session id -> groupBy
    (the classic sessionization shape; same semantics as native
    ``session_window``, whose gap boundary is exclusive — an event at
    exactly prev + gap starts a NEW session, hence ``>=``).

    Why not session_window: its physical plan runs a partial HashAggregate
    keyed on a per-event (start, end) STRUCT before the exchange — at one
    session-window per event that partial agg reduces nothing, hashes 100%
    of rows on a 16-byte struct key, and ships the struct through the
    shuffle (guide §2.3: shuffle fewer bytes).  The lag/cumsum twin shuffles
    bare (user_id, ts), shares ONE exchange+sort across both window ops AND
    the final aggregate (hash(user_id) satisfies the groupBy's clustering),
    and measured ~2x faster at sf0.1 with byte-identical results (oracle
    unchanged — it was already written in this form).  Rows with NULL ts
    are dropped exactly as session_window's implicit isnotnull filter did.
    """
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) >= SESSION_GAP_US),
        1,
    ).otherwise(0)
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        ev.filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select("user_id", "ts", F.sum("is_new").over(wc).alias("sess"))
    )
    return (
        tagged.groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def q_session_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level session metrology: how many sessions, how long, how big."""
    s = q_sessionize(spark, sf)
    dur_s = (F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start"))) / 1_000_000.0
    return s.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.avg(dur_s), 2).alias("avg_duration_s"),
    )


def q_range_join_banded(spark: SparkSession, sf: str) -> DataFrame:
    """customer.c_acctbal within +-RANGE_TOL of part.p_retailprice: band
    buckets of width 2*tol mean each customer lands in <= 2 buckets, so the
    theta join becomes an equi-join + residual |diff| filter."""
    part = load_table(spark, sf, "part").select("p_partkey", "p_retailprice")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    pb = part.withColumn("band", F.floor(F.col("p_retailprice") / RANGE_BAND))
    cb = cust.select(
        "c_custkey",
        "c_acctbal",
        F.explode(
            F.sequence(
                F.floor((F.col("c_acctbal") - RANGE_TOL) / RANGE_BAND),
                F.floor((F.col("c_acctbal") + RANGE_TOL) / RANGE_BAND),
            )
        ).alias("band"),
    )
    joined = cb.join(pb, "band").filter(
        F.abs(F.col("c_acctbal") - F.col("p_retailprice")) <= RANGE_TOL
    )
    return joined.agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(F.abs(F.col("c_acctbal") - F.col("p_retailprice"))), 4).alias("avg_absdiff"),
    )


def q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their first
    event; for each (cohort_week, week_offset) the count of cohort members
    active that week, plus the retention rate vs the cohort size.

    ONE fact scan at any scale: the cohort week is min(active_week) over a
    user window on the already-distinct (user, active_week) frame — not a
    separate first-seen aggregate joined back (a naive 3-scan/7-exchange
    plan; measured).  Cohort sizes need no extra pass either: every user is
    active in their own first week, so the offset-0 grid row IS the cohort
    size (broadcast self-join of the tiny weeks^2 grid).  The
    product-analytics companion to funnel_conversion."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort = active.withColumn(
        "cohort_week", F.min("active_week").over(Window.partitionBy("user_id"))
    )
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    grid = cohort.groupBy("cohort_week", offset.alias("week_offset")).agg(
        F.count("*").alias("n_active")
    )
    sizes = grid.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
    )


def q_user_activity_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Events-per-user distribution in power-of-two buckets — the
    engagement-skew profile (and the shuffle-skew early warning: a hot
    bucket at the top IS the key that needs salting downstream).  Two
    map-side-combinable aggregates; the second runs on the user domain."""
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    bucket = F.pow(F.lit(2.0), F.floor(F.log2("n_events"))).cast("long")
    return (
        per_user.groupBy(bucket.alias("bucket_min_events"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("total_events"),
        )
    )


ROLLING_DAYS = 7


def q_rolling_daily_value(spark: SparkSession, sf: str) -> DataFrame:
    """Daily value totals with a trailing 7-day moving average — the
    time-series smoothing shape.  The rolling window runs over the DAY
    grid (bounded: one row per day), never the raw events, so the sort is
    trivial at any fact scale."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.orderBy("day").rowsBetween(-(ROLLING_DAYS - 1), 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_value",
        "n_events",
        F.round(F.avg("day_value").over(w), 2).alias("avg_7d"),
        F.count("*").over(w).alias("window_days"),
    )


QUERIES: dict[str, Query] = {
    "asof_join": Query(
        q_asof_join,
        """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
        "as-of join: nearest prior click per purchase (union + running-last)",
    ),
    "sessionize": Query(
        q_sessionize,
        f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sess
""",
        "gap-based sessionization (session_window vs lag/cumsum oracle)",
    ),
    "session_stats": Query(
        q_session_stats,
        f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
), sessions AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM s GROUP BY user_id, sess
)
SELECT count(*) AS n_sessions, round(avg(n_events), 4) AS avg_events,
       max(n_events) AS max_events,
       round(avg((epoch_us(session_end) - epoch_us(session_start)) / 1000000.0), 2)
         AS avg_duration_s
FROM sessions
""",
        "session metrology",
    ),
    "range_join_banded": Query(
        q_range_join_banded,
        f"""
SELECT count(*) AS cnt,
       round(avg(abs(c_acctbal - p_retailprice)), 4) AS avg_absdiff
FROM customer JOIN part
  ON c_acctbal BETWEEN p_retailprice - {RANGE_TOL} AND p_retailprice + {RANGE_TOL}
""",
        "banded range join (equi-join on buckets + residual filter)",
    ),
    "cohort_retention": Query(
        q_cohort_retention,
        """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
), cohort_sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM first_seen GROUP BY cohort_week
), grid AS (
  SELECT f.cohort_week,
         CAST(floor(date_diff('day', f.cohort_week, a.active_week) / 7.0) AS BIGINT)
           AS week_offset,
         count(*) AS n_active
  FROM active a JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(g.cohort_week, '%Y-%m-%d') AS cohort_week, g.week_offset,
       g.n_active, c.cohort_size,
       round(CAST(g.n_active AS DOUBLE) / c.cohort_size, 4) AS retention
FROM grid g JOIN cohort_sizes c ON g.cohort_week = c.cohort_week
""",
        "weekly cohort retention matrix (first-seen week x active week)",
    ),
    "user_activity_histogram": Query(
        q_user_activity_histogram,
        """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
)
SELECT CAST(power(2, floor(log2(n_events))) AS BIGINT) AS bucket_min_events,
       count(*) AS n_users, CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_user GROUP BY 1
""",
        "events-per-user histogram in power-of-two buckets (skew profile)",
    ),
    "rolling_daily_value": Query(
        q_rolling_daily_value,
        f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, round(sum(value), 2) AS day_value,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, day_value, n_events,
       round(avg(day_value) OVER w, 2) AS avg_7d,
       count(*) OVER w AS window_days
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN {ROLLING_DAYS - 1} PRECEDING AND CURRENT ROW)
""",
        "trailing 7-day moving average over the bounded day grid",
    ),
}
