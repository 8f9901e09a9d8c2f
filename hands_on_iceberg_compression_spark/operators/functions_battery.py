"""Scalar-function batteries: broad cross-engine coverage of string, array,
and math built-ins, plus CUBE grouping.

Extends D14 (the reference's scalar-function inventory, SURVEY.md §2-D) to
the wider function surface a user of a complete engine expects.  Every
expression here is whole-stage-codegen JVM; each battery is one pruned scan.

Cross-engine notes baked into the expressions (learned by testing both):
- DuckDB ``list_distinct`` does not preserve order -> both sides sort;
- DuckDB ``list_slice`` is 1-based inclusive begin..end vs Spark's
  (start, length) -> translated explicitly;
- ``sign``/``signum`` return types differ -> cast to int on both sides;
- trig/exp differ in the last ulp across libm builds -> rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table


def _sample(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events").filter(F.col("event_id") < 50)


def q_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = _sample(spark, sf)
    t = F.col("event_type")
    return ev.select(
        "event_id",
        F.lpad(t, 10, "*").alias("lpadded"),
        F.rpad(t, 10, "*").alias("rpadded"),
        F.translate(t, "aeiou", "AEIOU").alias("translated"),
        F.reverse(t).alias("reversed"),
        F.repeat(t, 2).alias("repeated"),
        F.instr(t, "c").alias("c_pos"),
        F.expr("left(event_type, 3)").alias("left3"),
        F.expr("right(event_type, 3)").alias("right3"),
        F.split_part(F.col("props"), F.lit(":"), F.lit(1)).alias("props_key"),
        F.levenshtein(t, F.lit("click")).alias("lev_click"),
        F.ascii(t).alias("first_ascii"),
        F.startswith(t, F.lit("c")).alias("starts_c"),
        F.trim(F.concat(F.lit("  "), t, F.lit("  "))).alias("trimmed"),
    )


def _arr_str(a) -> "F.Column":
    """Canonical string form of a long-array — array-typed result columns
    hash unpredictably across engines/drivers, strings don't."""
    return F.array_join(F.transform(a, lambda x: x.cast("string")), ",")


def q_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 20)
    # integer-ize a slice of the embedding for exact cross-engine arithmetic
    ints = F.transform(
        F.slice(F.col("embedding"), 1, 8), lambda x: F.floor(x * 1000).cast("long")
    )
    return emb.select(
        "vec_id",
        F.size(ints).alias("n"),
        F.array_contains(ints, 0).alias("has_zero"),
        _arr_str(F.sort_array(ints)).alias("sorted_head"),
        _arr_str(F.sort_array(F.array_distinct(ints))).alias("distinct_sorted"),
        _arr_str(F.slice(ints, 2, 3)).alias("slice_2_3"),
        F.array_position(ints, F.element_at(ints, 1)).alias("first_pos"),
        _arr_str(ints).alias("joined"),
        F.array_max(ints).alias("arr_max"),
        F.array_min(ints).alias("arr_min"),
        _arr_str(F.flatten(F.array(ints, ints))).alias("doubled"),
    )


def q_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = _sample(spark, sf)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.pow(v, 2), 4).alias("squared"),
        F.round(F.sqrt(v), 6).alias("sqrtv"),
        F.round(F.exp(v / 100.0), 6).alias("expv"),
        F.round(F.log(v + 1.0), 6).alias("lnv"),
        F.round(F.log10(v + 1.0), 6).alias("log10v"),
        F.signum(v - 100.0).cast("int").alias("sign100"),
        F.greatest(v, F.lit(50.0), F.col("user_id").cast("double")).alias("biggest"),
        F.least(v, F.lit(50.0)).alias("smallest"),
        F.round(v % 7.0, 2).alias("mod7"),
    )


def q_window_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Window-function battery: rank family, lead/lag, ntile, running
    aggregates — one sort per partition serves all of them."""
    from pyspark.sql.window import Window

    ev = _sample(spark, sf)
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value_r"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("event_id", 1).over(w).alias("prev_id"),
        F.lead("event_id", 1).over(w).alias("next_id"),
        F.count("*").over(wrows).alias("running_cnt"),
        F.round(F.sum("value").over(wrows), 2).alias("running_sum"),
        F.first("event_id").over(w).alias("first_id"),
    )


def q_datetime_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime battery over the events timeline.  dayofweek is mapped
    explicitly (Spark: 1=Sunday; DuckDB dayofweek: 0=Sunday)."""
    ev = _sample(spark, sf)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        (F.dayofweek(ts) - 1).alias("dow_sun0"),
        F.dayofyear(ts).alias("doy"),
        F.date_trunc("hour", ts).alias("hour_bucket"),
        # dates as ISO strings: pandas renders Spark DateType as datetime.date
        # but DuckDB DATE as datetime64 — strings hash identically everywhere
        F.date_format(ts, "yyyy-MM-dd").alias("day_str"),
        F.datediff(F.lit("2024-06-01").cast("date"), F.to_date(ts)).alias("days_to_june"),
        F.unix_micros(ts).alias("epoch_us"),
    )


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (the general form of rollup/cube)."""
    from hands_on_iceberg_compression_spark.sources.fixtures import register_views

    register_views(spark, sf)
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


def q_cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q_agg_predicate_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate/ordering aggregates per event_type: count_if, bool_and/or,
    exact median, deterministic any_value (min stands in — any_value itself
    is nondeterministic and so untestable cross-engine)."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_extreme"),
        F.round(F.median("value"), 4).alias("median_value"),
        F.min("user_id").alias("first_user"),
    )


def q_ntile_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Price deciles via ntile(10) per return flag: per-decile row count and
    price range.  The order key is total (price, orderkey, linenumber) so
    tie placement — and therefore every decile boundary — is engine-exact.
    Scale note: a global/low-cardinality-partition ntile funnels each
    partition through one reducer; at warehouse scale bucket by
    approx-percentile boundaries instead (approx_quantile_battery is that
    twin) — this is the exact form for bounded partitions."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("decile", F.ntile(10).over(w))
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


QUERIES: dict[str, Query] = {
    "ntile_deciles": Query(
        q_ntile_deciles,
        """
SELECT l_returnflag, decile, count(*) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM (
  SELECT l_returnflag, l_extendedprice,
         ntile(10) OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS decile
  FROM lineitem
)
GROUP BY l_returnflag, decile
""",
        "ntile(10) price deciles per return flag (engine-exact tie order)",
    ),
    "agg_predicate_battery": Query(
        q_agg_predicate_battery,
        "SELECT event_type, CAST(count_if(value > 50) AS BIGINT) AS n_high, "
        "bool_and(value >= 0) AS all_nonneg, "
        "bool_or(value > 99) AS any_extreme, "
        "round(median(value), 4) AS median_value, "
        "min(user_id) AS first_user "
        "FROM events GROUP BY event_type",
        "predicate aggregates: count_if / bool_and / bool_or / median",
    ),
    "string_funcs_battery": Query(
        q_string_funcs,
        "SELECT event_id, lpad(event_type, 10, '*') AS lpadded, "
        "rpad(event_type, 10, '*') AS rpadded, "
        "translate(event_type, 'aeiou', 'AEIOU') AS translated, "
        "reverse(event_type) AS reversed, repeat(event_type, 2) AS repeated, "
        "strpos(event_type, 'c') AS c_pos, left(event_type, 3) AS left3, "
        "right(event_type, 3) AS right3, split_part(props, ':', 1) AS props_key, "
        "levenshtein(event_type, 'click') AS lev_click, ascii(event_type) AS first_ascii, "
        "starts_with(event_type, 'c') AS starts_c, "
        "trim('  ' || event_type || '  ') AS trimmed "
        "FROM events WHERE event_id < 50",
        "string function battery",
    ),
    "array_funcs_battery": Query(
        q_array_funcs,
        """
WITH ints AS (
  SELECT vec_id,
         list_transform(embedding[1:8], x -> CAST(floor(x * 1000) AS BIGINT)) AS a
  FROM embeddings WHERE vec_id < 20
)
SELECT vec_id, len(a) AS n, list_contains(a, 0) AS has_zero,
       array_to_string(list_sort(a), ',') AS sorted_head,
       array_to_string(list_sort(list_distinct(a)), ',') AS distinct_sorted,
       array_to_string(a[2:4], ',') AS slice_2_3,
       list_position(a, a[1]) AS first_pos,
       array_to_string(a, ',') AS joined,
       list_aggregate(a, 'max') AS arr_max,
       list_aggregate(a, 'min') AS arr_min,
       array_to_string(flatten([a, a]), ',') AS doubled
FROM ints
""",
        "array function battery",
    ),
    "math_funcs_battery": Query(
        q_math_funcs,
        "SELECT event_id, round(pow(value, 2), 4) AS squared, "
        "round(sqrt(value), 6) AS sqrtv, round(exp(value / 100.0), 6) AS expv, "
        "round(ln(value + 1.0), 6) AS lnv, round(log10(value + 1.0), 6) AS log10v, "
        "CAST(sign(value - 100.0) AS INTEGER) AS sign100, "
        "greatest(value, 50.0, CAST(user_id AS DOUBLE)) AS biggest, "
        "least(value, 50.0) AS smallest, "
        "round(fmod(value, 7.0), 2) AS mod7 "
        "FROM events WHERE event_id < 50",
        "math function battery",
    ),
    "window_funcs_battery": Query(
        q_window_funcs,
        "SELECT event_id, event_type, round(value, 2) AS value_r, "
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, "
        "row_number() OVER w AS rn, ntile(4) OVER w AS quartile, "
        "lag(event_id, 1) OVER w AS prev_id, lead(event_id, 1) OVER w AS next_id, "
        "count(*) OVER wr AS running_cnt, round(sum(value) OVER wr, 2) AS running_sum, "
        "first_value(event_id) OVER w AS first_id "
        "FROM events WHERE event_id < 50 "
        "WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id), "
        "wr AS (PARTITION BY event_type ORDER BY value, event_id "
        "ROWS UNBOUNDED PRECEDING)",
        "window function battery",
    ),
    "datetime_funcs_battery": Query(
        q_datetime_funcs,
        "SELECT event_id, year(ts) AS y, month(ts) AS mo, dayofmonth(ts) AS d, "
        "hour(ts) AS h, minute(ts) AS mi, CAST(floor(second(ts)) AS BIGINT) AS s, "
        "dayofweek(ts) AS dow_sun0, dayofyear(ts) AS doy, "
        "date_trunc('hour', ts) AS hour_bucket, strftime(ts, '%Y-%m-%d') AS day_str, "
        "date_diff('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_to_june, "
        "epoch_us(ts) AS epoch_us "
        "FROM events WHERE event_id < 50",
        "datetime function battery",
    ),
    "grouping_sets_agg": Query(
        q_grouping_sets,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())",
        "explicit GROUPING SETS",
    ),
    "cube_agg": Query(
        q_cube_agg,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem "
        "GROUP BY CUBE(l_returnflag, l_linestatus)",
        "GROUP BY CUBE",
    ),
}
