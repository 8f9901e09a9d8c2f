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


def q_cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


QUERIES: dict[str, Query] = {
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
    "cube_agg": Query(
        q_cube_agg,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem "
        "GROUP BY CUBE(l_returnflag, l_linestatus)",
        "GROUP BY CUBE",
    ),
}
