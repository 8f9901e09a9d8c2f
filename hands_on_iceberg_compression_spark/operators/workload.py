"""The reference's documented query workload, Spark-first, plus the relational
operators a complete engine needs (joins, windows, set ops, distinct, sorts).

Parity: reference ``temp.md:38-106`` (scan/LIMIT, COUNT, equality, range,
BETWEEN, LIKE, the flagship conjunction) and ``src/commands/bench.ts:132,150``
(NULLIF/COALESCE aggregate shapes) — SURVEY.md §2-D.  The reference had no
joins/group-bys/windows over data (SURVEY.md §2 closing note); those are part
of this engine's widened surface.

Scale notes (100 TB posture):
- every query is a declarative DataFrame plan: filters/projections reach the
  parquet scan (PushedFilters), aggregations are partial (map-side combine);
- small dimensions are broadcast explicitly (``F.broadcast``) so the big fact
  side never shuffles for those joins;
- fact-fact joins shuffle on the join key and rely on AQE skew handling;
- top-k = ``ORDER BY .. LIMIT k`` which Spark executes as per-partition
  TakeOrdered + driver merge of k rows — no global sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table

# Shared predicate constants (events ts span is Jan 2024 in all fixture SFs).
TS_LO = "2024-01-10 00:00:00"
TS_HI = "2024-01-20 00:00:00"
FLAG_LO = "2024-01-05 00:00:00"
FLAG_HI = "2024-01-25 00:00:00"


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


# --- D1/D3: scans, limits, equality filters -------------------------------


def q_scan_limit(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:39 `SELECT * FROM t LIMIT 10`, made deterministic with a sort key
    return load_table(spark, sf, "events").orderBy("event_id").limit(10)


def q_count_star(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:10 `SELECT COUNT(*)`
    return load_table(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


def q_eq_string(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:42-44 COUNT + varchar equality
    return (
        load_table(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .agg(F.count("*").alias("cnt"))
    )


def q_eq_string_limit(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:46-48 SELECT * + varchar equality + LIMIT
    return (
        load_table(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(10)
    )


def q_eq_timestamp(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:62-64 COUNT + timestamp equality; the literal is the table's own
    # min(ts) via a broadcast scalar join (single extra cheap column scan)
    ev = load_table(spark, sf, "events")
    mn = ev.agg(F.min("ts").alias("ts_min"))
    return (
        ev.join(F.broadcast(mn), ev["ts"] == mn["ts_min"])
        .agg(F.count("*").alias("cnt"))
    )


# --- D5/D6: range predicates ----------------------------------------------


def q_range_conj(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:76-78 `ts > a AND ts < b`
    return (
        load_table(spark, sf, "events")
        .filter((F.col("ts") > _ts(TS_LO)) & (F.col("ts") < _ts(TS_HI)))
        .agg(F.count("*").alias("cnt"))
    )


def q_between(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:81-82 BETWEEN
    return (
        load_table(spark, sf, "events")
        .filter(F.col("ts").between(_ts(TS_LO), _ts(TS_HI)))
        .agg(F.count("*").alias("cnt"))
    )


# --- D7/D8: LIKE + the flagship conjunction -------------------------------


def q_like_rare(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:87-88 low-selectivity infix LIKE
    return (
        load_table(spark, sf, "events")
        .filter(F.col("props").like("%99}%"))
        .agg(F.count("*").alias("cnt"))
    )


def q_like_common(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:93-94 high-selectivity infix LIKE
    return (
        load_table(spark, sf, "events")
        .filter(F.col("props").like("%3%"))
        .agg(F.count("*").alias("cnt"))
    )


def q_flagship(spark: SparkSession, sf: str) -> DataFrame:
    # temp.md:99-105: LIKE AND BETWEEN AND numeric `<` — the reference's
    # flagship benchmark query (also used CPU/mem-constrained, temp.md:112).
    # Conjunct order is evaluation order in codegen (short-circuit AND):
    # cheap numeric/timestamp comparisons first, substring scan last, so the
    # expensive contains() runs only on rows surviving the cheap filters —
    # the predicate reordering Trino's optimizer applies automatically.
    return (
        load_table(spark, sf, "events")
        .filter(
            (F.col("value") < 80)
            & F.col("ts").between(_ts(FLAG_LO), _ts(FLAG_HI))
            & F.col("props").like("%3%")
        )
        .agg(F.count("*").alias("cnt"))
    )


# --- D9/D10: aggregate arithmetic shapes ----------------------------------


def q_agg_ratio(spark: SparkSession, sf: str) -> DataFrame:
    # bench.ts:132 `SUM(a) / NULLIF(SUM(b), 0)` (bytes-per-row metrology shape)
    ev = load_table(spark, sf, "events")
    click_sum = F.sum(F.when(F.col("event_type") == "click", F.col("value")))
    return ev.agg(
        F.round(F.sum("value") / F.nullif(click_sum, F.lit(0.0)), 6).alias("ratio")
    )


def q_agg_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    # bench.ts:150 `COALESCE(SUM(x), 0)` over an empty group
    ev = load_table(spark, sf, "events")
    s = F.sum(F.when(F.col("event_type") == "no_such_type", F.col("value")))
    return ev.agg(F.round(F.coalesce(s, F.lit(0.0)), 2).alias("total"))


# --- grouped aggregation (TPC-H Q1 shape) ---------------------------------


def q_group_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_per_minute(spark: SparkSession, sf: str) -> DataFrame:
    # time-bucketed rollup (streaming-friendly shape; batch twin of
    # streaming/events_stream.py's windowed aggregation)
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_case_buckets(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


# --- joins ----------------------------------------------------------------


def q_join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    # star join: fact orders -> dims customer/nation/region, all broadcast.
    # At 100 TB the fact side streams; no shuffle on orders at all.
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_join_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    # fact-fact join: lineitem x orders shuffle on orderkey (AQE handles skew)
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
    )


def q_tpch_q3_shape(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q3 shape: 3-way join + group + top-10 by revenue
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_tpch_q5_shape(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join (local supplier volume for one region,
    one order year).  Plan at scale: lineitem-orders-customer-supplier
    shuffle on their keys (AQE re-plans skew), nation+region broadcast —
    region filter prunes before any big join; the date range reaches the
    orders scan as a pushed filter."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    # customers with >= 1 order (EXISTS) — left_semi never widens rows
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .agg(F.count("*").alias("cnt"))
    )


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    # customers with no orders (NOT EXISTS)
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("cnt"))
    )


# --- windows, distinct, set ops, sorts ------------------------------------


def q_window_topn(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf, "orders")
    # NB: o_orderpriority has 5 values, so the final per-partition reducers
    # bound parallelism at 5 — acceptable for top-3-per-priority (each
    # reducer streams its partition once); a high-cardinality partition key
    # or a pre-aggregation (local top-3 per input split, then re-rank)
    # is the shape to reach for if the key set were wider than the cluster.
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


def q_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


def q_union_all(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").agg(
        F.lit("click").alias("src"), F.count("*").alias("cnt")
    )
    b = ev.filter(F.col("event_type") == "purchase").agg(
        F.lit("purchase").alias("src"), F.count("*").alias("cnt")
    )
    return a.unionByName(b)


def q_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .select("event_id", "value")
        .limit(20)
    )


def q_scalar_funcs(spark: SparkSession, sf: str) -> DataFrame:
    # D14 scalar-function battery over a pruned scan
    ev = load_table(spark, sf, "events")
    return ev.filter(F.col("event_id") < 100).select(
        "event_id",
        F.upper(F.col("event_type")).alias("type_upper"),
        F.substring(F.col("event_type"), 1, 3).alias("type_pfx"),
        F.length(F.col("props")).alias("props_len"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias("tag"),
        F.round(F.abs(F.col("value") - F.lit(100.0)), 2).alias("dist100"),
        F.floor(F.col("value")).alias("value_floor"),
        F.ceil(F.col("value")).alias("value_ceil"),
        F.pmod(F.col("user_id"), F.lit(7)).alias("user_mod"),
        F.coalesce(F.col("props"), F.lit("{}")).alias("props_nn"),
    )


QUERIES: dict[str, Query] = {
    "scan_limit": Query(
        q_scan_limit,
        "SELECT * FROM events ORDER BY event_id LIMIT 10",
        "D1 full scan + LIMIT (temp.md:39)",
    ),
    "count_star": Query(
        q_count_star,
        "SELECT count(*) AS cnt FROM lineitem",
        "D2 COUNT(*) (temp.md:10)",
    ),
    "filter_eq_string": Query(
        q_eq_string,
        "SELECT count(*) AS cnt FROM events WHERE event_type = 'click'",
        "D3 varchar equality (temp.md:42-44)",
    ),
    "filter_eq_string_limit": Query(
        q_eq_string_limit,
        "SELECT event_id, event_type, value FROM events WHERE event_type = 'click' "
        "ORDER BY event_id LIMIT 10",
        "D3 equality + projection + LIMIT (temp.md:46-48)",
    ),
    "filter_eq_timestamp": Query(
        q_eq_timestamp,
        "SELECT count(*) AS cnt FROM events WHERE ts = (SELECT min(ts) FROM events)",
        "D4 timestamp equality (temp.md:62-64)",
    ),
    "filter_range_conj": Query(
        q_range_conj,
        f"SELECT count(*) AS cnt FROM events WHERE ts > TIMESTAMP '{TS_LO}' "
        f"AND ts < TIMESTAMP '{TS_HI}'",
        "D5 range conjunction (temp.md:76-78)",
    ),
    "filter_between": Query(
        q_between,
        f"SELECT count(*) AS cnt FROM events WHERE ts BETWEEN TIMESTAMP '{TS_LO}' "
        f"AND TIMESTAMP '{TS_HI}'",
        "D6 BETWEEN (temp.md:81-82)",
    ),
    "like_rare": Query(
        q_like_rare,
        "SELECT count(*) AS cnt FROM events WHERE props LIKE '%99}%'",
        "D7 low-selectivity infix LIKE (temp.md:87-88)",
    ),
    "like_common": Query(
        q_like_common,
        "SELECT count(*) AS cnt FROM events WHERE props LIKE '%3%'",
        "D7 high-selectivity infix LIKE (temp.md:93-94)",
    ),
    "flagship_conjunction": Query(
        q_flagship,
        f"SELECT count(*) AS cnt FROM events WHERE props LIKE '%3%' "
        f"AND ts BETWEEN TIMESTAMP '{FLAG_LO}' AND TIMESTAMP '{FLAG_HI}' "
        f"AND value < 80",
        "D8 flagship: LIKE AND BETWEEN AND numeric < (temp.md:99-105)",
    ),
    "agg_ratio_nullif": Query(
        q_agg_ratio,
        "SELECT round(sum(value) / nullif(sum(CASE WHEN event_type = 'click' "
        "THEN value END), 0), 6) AS ratio FROM events",
        "D9 SUM/NULLIF(SUM,0) (bench.ts:132)",
    ),
    "agg_coalesce": Query(
        q_agg_coalesce,
        "SELECT round(coalesce(sum(CASE WHEN event_type = 'no_such_type' THEN value "
        "END), 0), 2) AS total FROM events",
        "D10 COALESCE(SUM,0) (bench.ts:150)",
    ),
    "group_agg": Query(
        q_group_agg,
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price, "
        "round(avg(l_quantity), 4) AS avg_qty, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus",
        "grouped aggregation (TPC-H Q1 shape)",
    ),
    "per_minute_rollup": Query(
        q_per_minute,
        "SELECT date_trunc('minute', ts) AS minute, count(*) AS cnt, "
        "round(sum(value), 2) AS sum_value FROM events GROUP BY 1",
        "time-bucketed rollup (batch twin of the streaming window agg)",
    ),
    "case_buckets": Query(
        q_case_buckets,
        "SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 200 THEN 'mid' "
        "ELSE 'high' END AS bucket, count(*) AS cnt FROM events GROUP BY 1",
        "CASE WHEN bucketed aggregation",
    ),
    "join_broadcast_star": Query(
        q_join_broadcast,
        "SELECT r_name, count(*) AS order_cnt, round(sum(o_totalprice), 2) AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
        "broadcast star join (fact never shuffles)",
    ),
    "join_shuffle_agg": Query(
        q_join_shuffle,
        "SELECT o_orderstatus, round(sum(l_extendedprice * (1.0 - l_discount)), 2) "
        "AS revenue, count(*) AS line_cnt FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus",
        "fact-fact shuffle join + aggregation",
    ),
    "tpch_q3_shape": Query(
        q_tpch_q3_shape,
        "SELECT o_orderkey, o_orderdate, "
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10",
        "TPC-H Q3 shape: multi-join + group + top-k",
    ),
    "tpch_q5_shape": Query(
        q_tpch_q5_shape,
        "SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name ORDER BY revenue DESC, n_name",
        "TPC-H Q5 shape: 6-table join, broadcast dims, date pushdown",
    ),
    "semi_join": Query(
        q_semi_join,
        "SELECT count(*) AS cnt FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
        "left semi join (EXISTS)",
    ),
    "anti_join": Query(
        q_anti_join,
        "SELECT count(*) AS cnt FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
        "left anti join (NOT EXISTS)",
    ),
    "window_topn": Query(
        q_window_topn,
        "SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM ("
        "SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER ("
        "PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "FROM orders) WHERE rn <= 3",
        "window function: top-n per group",
    ),
    "distinct_count": Query(
        q_distinct_count,
        "SELECT count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) "
        "AS n_types FROM events",
        "exact distinct aggregation",
    ),
    "set_intersect": Query(
        q_set_intersect,
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT "
        "SELECT s_nationkey AS nationkey FROM supplier",
        "INTERSECT set operation",
    ),
    "union_all_counts": Query(
        q_union_all,
        "SELECT 'click' AS src, count(*) AS cnt FROM events WHERE event_type='click' "
        "UNION ALL SELECT 'purchase' AS src, count(*) AS cnt FROM events "
        "WHERE event_type='purchase'",
        "UNION ALL",
    ),
    "sort_limit": Query(
        q_sort_limit,
        "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 20",
        "global top-k (TakeOrdered, no full sort at scale)",
    ),
    "scalar_funcs": Query(
        q_scalar_funcs,
        "SELECT event_id, upper(event_type) AS type_upper, "
        "substring(event_type, 1, 3) AS type_pfx, length(props) AS props_len, "
        "concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag, "
        "round(abs(value - 100.0), 2) AS dist100, "
        "CAST(floor(value) AS BIGINT) AS value_floor, "
        "CAST(ceil(value) AS BIGINT) AS value_ceil, "
        "user_id % 7 AS user_mod, coalesce(props, '{}') AS props_nn "
        "FROM events WHERE event_id < 100",
        "D14 scalar-function battery over a pruned scan",
    ),
}
