"""Bucketed co-located join: the shuffle must disappear.

Writes the same data twice — once plain, once bucketed on the join key —
and asserts the bucketed sort-merge join plans ZERO exchanges while the
plain one shuffles both sides.  This is the pre-partitioning pattern that
makes repeated fact x fact joins viable at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.sources.bucketed import (
    drop_table,
    write_bucketed,
)
from hands_on_iceberg_compression_spark.sources.fixtures import load_table

from tests.conftest import SF_SMALL

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    write_bucketed(ev, "ev_bucketed", "user_id", N_BUCKETS, sort_col="user_id")
    write_bucketed(agg, "agg_bucketed", "user_id", N_BUCKETS, sort_col="user_id")
    ev.write.mode("overwrite").format("parquet").saveAsTable("ev_plain")
    agg.write.mode("overwrite").format("parquet").saveAsTable("agg_plain")
    yield
    for t in ("ev_bucketed", "agg_bucketed", "ev_plain", "agg_plain"):
        drop_table(spark, t)


def _join_plan(spark, left: str, right: str) -> str:
    # force the sort-merge path: broadcast would hide the co-location story
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (
            spark.table(left)
            .join(spark.table(right), "user_id")
            .groupBy("user_id")
            .agg(F.sum("value").alias("s"), F.max("n_events").alias("n"))
        )
        df.collect()  # let AQE finalize the physical plan
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    plan = _join_plan(spark, "ev_bucketed", "agg_bucketed")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_plain_join_shuffles_both_sides(spark, bucketed_tables):
    plan = _join_plan(spark, "ev_plain", "agg_plain")
    assert plan.count("Exchange hashpartitioning") >= 2


def test_bucketed_results_match_plain(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def res(l, r):
            return sorted(
                spark.table(l)
                .join(spark.table(r), "user_id")
                .groupBy("user_id")
                .agg(F.sum("value").alias("s"))
                .collect()
            )

        assert res("ev_bucketed", "agg_bucketed") == res("ev_plain", "agg_plain")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
