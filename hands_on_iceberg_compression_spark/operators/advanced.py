"""Advanced relational surface: rollups, subqueries, pivot, JSON/regex
functions, statistics, outer joins, deterministic sampling, and the
generator DSL exposed as queries.

These go beyond the reference's documented workload (SURVEY.md §2 closing
note lists exactly what it lacked) — they complete the engine so "every query
a user runs today" has a home, and each carries a DuckDB oracle where the
semantics are engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table


def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical totals in one pass (partial-agg
    friendly; Spark expands grouping sets map-side)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q_month_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Date bucketing on the orders timeline."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_tpch_q6_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single agg — the pushdown showcase."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q_tpch_q1_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the pricing-summary report — wide multi-aggregate
    groupBy over a date-filtered fact scan.  Every aggregate is
    map-side-combinable, so at 100 TB this is one scan + a 6-row shuffle;
    the shipdate filter reaches the parquet scan (min/max stat skipping on
    the sorted/compacted layout)."""
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Event-funnel conversion (view -> click -> purchase): per-user first
    occurrence of each stage, then strict temporal-order counts.  One shuffle
    on user_id with map-side-combined conditional mins; the final count is a
    single-row agg — the canonical product-analytics shape, linear at 100 TB."""
    ev = load_table(spark, sf, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_view_click"),
        F.sum(purchased.cast("long")).alias("n_full_funnel"),
        F.round(
            F.sum(clicked.cast("long")) / F.sum(viewed.cast("long")), 4
        ).alias("click_rate"),
        F.round(
            F.sum(purchased.cast("long")) / F.sum(clicked.cast("long")), 4
        ).alias("purchase_rate"),
    )


def q_approx_quantile_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile sketches (GK/KLL-style `approx_percentile`) — the 100 TB
    percentile path: mergeable sketches, one pass, no global sort.  Sketch
    internals are engine-specific, so no DuckDB value oracle (rows-only);
    tests/test_pipeline_ops_semantics.py pins each estimate within 5% rank
    error of the exact percentile."""
    ev = load_table(spark, sf, "events")
    pcts = F.percentile_approx(
        F.col("value"), F.array(*[F.lit(p) for p in (0.5, 0.9, 0.99)]), 10_000
    )
    return ev.groupBy("event_type").agg(
        F.round(pcts[0], 4).alias("p50"),
        F.round(pcts[1], 4).alias("p90"),
        F.round(pcts[2], 4).alias("p99"),
        F.count("*").alias("n"),
    )


def q_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 4).alias("median_qty"),
    )


def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL sketch — the 100 TB cardinality path (exact distinct is the
    oracle-checked twin in workload.py).  Approximate -> rows-only check."""
    ev = load_table(spark, sf, "events")
    return ev.agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))


def q_in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """IN (SELECT ...) — decorrelates to a semi join."""
    orders = load_table(spark, sf, "orders")
    rich = load_table(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return (
        orders.join(rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(F.count("*").alias("cnt"))
    )


def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Filter against a scalar aggregate (broadcast single-row join)."""
    li = load_table(spark, sf, "lineitem")
    avg_qty = li.agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(avg_qty))
        .filter(F.col("l_quantity") > F.col("avg_qty"))
        .agg(F.count("*").alias("cnt"))
    )


def q_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    return (
        region.crossJoin(nation)
        .select(F.col("r_name"), F.col("n_name"))
        .agg(F.count("*").alias("cnt"))
    )


def q_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER customer<->orders; counts matched/unmatched sides."""
    cust = load_table(spark, sf, "customer").select("c_custkey")
    okeys = load_table(spark, sf, "orders").select("o_custkey").distinct()
    j = cust.join(okeys, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    return j.agg(
        F.count("*").alias("total"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("cust_no_orders"),
        F.sum(F.col("c_custkey").isNull().cast("long")).alias("orders_no_cust"),
    )


def q_pivot_counts(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT event counts per user decile — fixed value list keeps the
    output schema static (required for pivot at scale anyway)."""
    ev = load_table(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("user_decile", F.pmod(F.col("user_id"), F.lit(10)))
        .groupBy("user_decile")
        .pivot("event_type", types)
        .count()
    )


def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field extraction from props ({"k": N}) + numeric agg."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )


def q_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Regex capture over props; distribution of the extracted digits."""
    ev = load_table(spark, sf, "events")
    digits = F.regexp_extract(F.col("props"), r"(\d+)", 1).cast("long")
    return (
        ev.groupBy((digits % 10).alias("last_mod"))
        .agg(F.count("*").alias("cnt"))
    )


def q_deterministic_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 5% sample by key modulus — replayable across engines
    and partitionings (unlike TABLESAMPLE)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.filter(F.pmod(F.col("event_id"), F.lit(20)) == 0)
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def q_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiler: null count, distinct count, min/max per column of
    events — ONE scan (single wide aggregate), then stack/UNPIVOT to one row
    per column.  The standard data-quality sweep; at 100 TB this is exactly
    one pass + a 6-row driver result."""
    ev = load_table(spark, sf, "events")

    def _str(c):
        col = F.col(c)
        if c == "ts":
            return lambda agg: F.date_format(agg, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        return lambda agg: agg.cast("string")

    aggs = []
    for c in _PROFILE_COLS:
        s = _str(c)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            s(F.min(F.col(c))).alias(f"{c}__min"),
            s(F.max(F.col(c))).alias(f"{c}__max"),
        ]
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)"
    )


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
        if c == "ts":
            mn = "strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')"
            mx = "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f')"
        parts.append(
            f"SELECT '{c}' AS column_name, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_val, {mx} AS max_val "
            "FROM events"
        )
    return " UNION ALL ".join(parts)


def q_collect_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """collect_list aggregation: per event_type, the sorted value list of its
    5 highest-value events, canonicalized to a string (collect order is
    nondeterministic -> always sort before exposing)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    top = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    arr = F.array_sort(F.collect_list(F.round(F.col("value"), 2)))
    return (
        top.groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(arr, lambda x: x.cast("string")), ","
            ).alias("top_values")
        )
    )


SALT_BUCKETS = 16


def q_skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately skewed key.

    ~80% of events collapse onto one 'hot' key; a naive groupBy sends them
    all to one reducer.  Salting appends a random-ish bucket to the key for
    the partial aggregate (fan-out SALT_BUCKETS ways), then the tiny partial
    results re-aggregate on the bare key.  Result is identical to the naive
    plan — the oracle is the plain GROUP BY."""
    ev = load_table(spark, sf, "events")
    key = F.when(F.col("value") < 400, F.lit("hot")).otherwise(
        F.col("user_id").cast("string")
    )
    salted = ev.select(
        key.alias("k"),
        F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
        "value",
    )
    partial = salted.groupBy("k", "salt").agg(
        F.count("*").alias("c"), F.sum("value").alias("s")
    )
    return (
        partial.groupBy("k")
        .agg(
            F.sum("c").alias("cnt"),
            F.round(F.sum("s"), 2).alias("sum_value"),
        )
    )


def q_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL snapshot-diff shape: rows of events minus the deterministic
    sample — the multiset-difference operator incremental pipelines use to
    diff table versions."""
    ev = load_table(spark, sf, "events").select("event_id", "event_type")
    sample = ev.filter(F.pmod(F.col("event_id"), F.lit(20)) == 0)
    return ev.exceptAll(sample).agg(F.count("*").alias("cnt"))


def q_gen_narrow_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Generator DSL through the driver contract: 1000 deterministic rows of
    the narrow example schema (engine-specific hashing -> rows-only).

    Array-typed columns are canonicalized to joined strings: the driver's
    canonicalizer (pandas sort_values) dies on list cells even for rows-only
    checks (the one ERROR in CORRECTNESS_r01.json)."""
    from hands_on_iceberg_compression_spark.functions.generators import generate_df
    from hands_on_iceberg_compression_spark.schema.reference_schemas import (
        narrow_example_config,
    )

    df = generate_df(spark, narrow_example_config(), 1, 1000, seed=42)
    for field in df.schema.fields:
        if field.dataType.typeName() == "array":
            df = df.withColumn(
                field.name,
                F.array_join(F.col(field.name).cast("array<string>"), ","),
            )
    return df


def q_gen_wide_sample(spark: SparkSession, sf: str) -> DataFrame:
    """1000 rows of the reference's 90-column wide events schema
    (tableConfig.ts:15-192), bit-exact enum dictionaries."""
    from hands_on_iceberg_compression_spark.functions.generators import generate_df
    from hands_on_iceberg_compression_spark.schema.reference_schemas import (
        wide_events_config,
    )

    return generate_df(spark, wide_events_config(), 1, 1000, seed=42)


def q_tpch_q4_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority where EXISTS a qualifying
    lineitem — decorrelates to a LEFT SEMI join on l_orderkey.  (The fixture
    lineitem has no commit/receipt dates, so the EXISTS predicate is
    l_quantity > 45; the plan shape — date-filtered orders semi-joined to a
    filtered fact, then a tiny groupBy — is Q4's.)  At 100 TB the semi join
    shuffles only (orderkey) pairs that survive both filters; no row
    multiplication can occur by construction."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    qualifying = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(qualifying, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_tpch_q14_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — fact scan joined to the
    part dimension with a conditional aggregate ratio.  part is a classic
    broadcast dimension (bounded by the catalog, not the fact volume), so
    the join is map-side at any fact scale; both sums combine map-side."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100 * F.sum(promo) / F.sum(revenue), 4).alias("promo_revenue_pct"),
            F.round(F.sum(revenue), 2).alias("total_revenue"),
        )
    )


_DOC_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


def q_profile_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The data-quality sweep over the documents table — same one-scan
    wide-aggregate + UNPIVOT shape as q_profile_table, applied to the corpus
    catalog columns (text itself is profiled by the text_* operators)."""
    docs = load_table(spark, sf, "documents")
    aggs = []
    for c in _DOC_PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _DOC_PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_DOC_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)"
    )


def _doc_profile_oracle() -> str:
    parts = [
        f"SELECT '{c}' AS column_name, "
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct, "
        f"CAST(min({c}) AS VARCHAR) AS min_val, "
        f"CAST(max({c}) AS VARCHAR) AS max_val FROM documents"
        for c in _DOC_PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


ZSCORE_THRESHOLD = 3.0  # |z| beyond this counts as an outlier


def q_value_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type outlier census: two-pass z-score (grouped stats, then
    a broadcast join back onto the scan).  Both passes are map-side
    combinable; the stats side is bounded by the type domain, so the join
    is always broadcast — the standard large-scale anomaly sweep."""
    ev = load_table(spark, sf, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    # nullif guards the constant-group case identically on both engines:
    # Spark's non-ANSI Divide already NULLs on zero, DuckDB's IEEE double
    # division yields inf — NULLIF makes both sides NULL, and the outlier
    # count coalesces per-row so an all-NULL group sums to 0, not NULL
    z = F.abs((F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce((z > ZSCORE_THRESHOLD).cast("long"), F.lit(0))).alias(
                "n_outliers"
            ),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


def q_customer_ltv_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 customers by order lifetime value, with their nation — fact
    aggregate first (shrinks to the customer domain), THEN the broadcast
    dimension joins, then a global top-k (TakeOrdered, no full sort)."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    ltv = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("ltv"),
        F.count("*").alias("n_orders"),
    )
    return (
        ltv.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), "ltv", "n_orders")
        .orderBy(F.col("ltv").desc(), "c_custkey")
        .limit(10)
    )


QUERIES: dict[str, Query] = {
    "rollup_agg": Query(
        q_rollup,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        "GROUP BY ROLLUP hierarchical aggregation",
    ),
    "month_rollup": Query(
        q_month_rollup,
        "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS cnt, "
        "round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1",
        "monthly date bucketing",
    ),
    "tpch_q6_shape": Query(
        q_tpch_q6_shape,
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
        "TPC-H Q6 shape: filter + single aggregate",
    ),
    "tpch_q1_shape": Query(
        q_tpch_q1_shape,
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "round(avg(l_extendedprice), 4) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus",
        "TPC-H Q1 shape: pricing summary (wide multi-agg groupBy)",
    ),
    "tpch_q4_shape": Query(
        q_tpch_q4_shape,
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
        "GROUP BY o_orderpriority",
        "TPC-H Q4 shape: EXISTS decorrelated to left-semi join",
    ),
    "tpch_q14_shape": Query(
        q_tpch_q14_shape,
        "SELECT round(100 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'",
        "TPC-H Q14 shape: promo revenue share (broadcast dim join + conditional agg)",
    ),
    "profile_documents": Query(
        q_profile_documents,
        _doc_profile_oracle(),
        "data-quality profile of the documents catalog columns (one scan + UNPIVOT)",
    ),
    "value_outliers": Query(
        q_value_outliers,
        f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       CAST(sum(CASE WHEN abs((e.value - s.mu) / nullif(s.sigma, 0)) > {ZSCORE_THRESHOLD}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs((e.value - s.mu) / nullif(s.sigma, 0))), 4) AS max_abs_z
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type
""",
        "per-type z-score outlier census (two-pass, broadcast stats join)",
    ),
    "customer_ltv_topk": Query(
        q_customer_ltv_topk,
        "SELECT c_custkey, c_name, n_name AS nation, "
        "round(sum(o_totalprice), 2) AS ltv, count(*) AS n_orders "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY ltv DESC, c_custkey LIMIT 10",
        "top-10 customer lifetime value with nation (agg-then-join, TakeOrdered)",
    ),
    "funnel_conversion": Query(
        q_funnel_conversion,
        """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), flags AS (
  SELECT t_view IS NOT NULL AS viewed,
         t_view IS NOT NULL AND t_click > t_view AS clicked,
         t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click AS purchased
  FROM per_user
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN viewed THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(sum(CASE WHEN purchased THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
       round(CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN viewed THEN 1 ELSE 0 END), 4) AS click_rate,
       round(CAST(sum(CASE WHEN purchased THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN clicked THEN 1 ELSE 0 END), 4) AS purchase_rate
FROM flags
""",
        "event-funnel conversion (view -> click -> purchase, strict order)",
    ),
    "approx_quantile_battery": Query(
        q_approx_quantile_battery,
        None,  # sketch estimates are engine-specific; pytest pins rank error
        "approx_percentile sketch battery per event_type (p50/p90/p99)",
    ),
    "stats_agg": Query(
        q_stats_agg,
        "SELECT round(avg(l_extendedprice), 2) AS avg_price, "
        "round(stddev_samp(l_extendedprice), 2) AS stddev_price, "
        "round(min(l_extendedprice), 2) AS min_price, "
        "round(max(l_extendedprice), 2) AS max_price, "
        "round(quantile_cont(l_quantity, 0.5), 4) AS median_qty FROM lineitem",
        "statistical aggregates incl. exact interpolated median",
    ),
    "approx_distinct": Query(
        q_approx_distinct,
        None,  # HLL sketch values are engine-specific; rows-only check
        "approximate distinct (HLL) — scale path for cardinality",
    ),
    "in_subquery": Query(
        q_in_subquery,
        "SELECT count(*) AS cnt FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)",
        "IN subquery (semi-join decorrelation)",
    ),
    "scalar_subquery": Query(
        q_scalar_subquery,
        "SELECT count(*) AS cnt FROM lineitem "
        "WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)",
        "scalar aggregate subquery",
    ),
    "cross_join_count": Query(
        q_cross_join,
        "SELECT count(*) AS cnt FROM region CROSS JOIN nation",
        "cross join",
    ),
    "full_outer_join": Query(
        q_full_outer_join,
        "SELECT count(*) AS total, "
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_no_orders, "
        "CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_no_cust "
        "FROM customer FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o "
        "ON c_custkey = o_custkey",
        "full outer join with unmatched-side accounting",
    ),
    "pivot_counts": Query(
        q_pivot_counts,
        "SELECT user_id % 10 AS user_decile, "
        "CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
        "CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
        "CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
        "CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
        "CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
        "FROM events GROUP BY 1",
        "pivot with fixed value list",
    ),
    "json_extract": Query(
        q_json_extract,
        "SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) "
        "AS avg_k, max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k "
        "FROM events GROUP BY event_type",
        "JSON field extraction + aggregation",
    ),
    "regexp_extract_agg": Query(
        q_regexp_extract,
        "SELECT CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) % 10 AS last_mod, "
        "count(*) AS cnt FROM events GROUP BY 1",
        "regex capture + aggregation",
    ),
    "deterministic_sample": Query(
        q_deterministic_sample,
        "SELECT count(*) AS cnt, round(sum(value), 2) AS sum_value FROM events "
        "WHERE event_id % 20 = 0",
        "deterministic key-modulus sampling",
    ),
    "collect_sorted_topvalues": Query(
        q_collect_sorted,
        """
WITH top AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
)
SELECT event_type,
       array_to_string(list_transform(list_sort(list(round(value, 2))), x -> CAST(x AS VARCHAR)), ',') AS top_values
FROM top WHERE rn <= 5 GROUP BY event_type
""",
        "collect_list aggregation, sorted + canonicalized",
    ),
    "skew_salted_agg": Query(
        q_skew_salted_agg,
        "SELECT CASE WHEN value < 400 THEN 'hot' ELSE CAST(user_id AS VARCHAR) END "
        "AS k, count(*) AS cnt, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1",
        "salted two-phase aggregation over a skewed key (== plain GROUP BY)",
    ),
    "profile_table": Query(
        q_profile_table,
        _profile_oracle(),
        "column profiler: nulls/distinct/min/max per column, one scan + stack",
    ),
    "except_all_diff": Query(
        q_except_all,
        "SELECT count(*) AS cnt FROM (SELECT event_id, event_type FROM events "
        "EXCEPT ALL SELECT event_id, event_type FROM events WHERE event_id % 20 = 0)",
        "EXCEPT ALL multiset difference (snapshot-diff shape)",
    ),
    "gen_narrow_sample": Query(
        q_gen_narrow_sample,
        None,  # engine-specific hashing; rows-only (schema + count + determinism)
        "generator DSL: narrow example schema (all DSL kinds)",
    ),
    "gen_wide_sample": Query(
        q_gen_wide_sample,
        None,  # engine-specific hashing; rows-only
        "generator DSL: reference 90-column wide events schema",
    ),
}
