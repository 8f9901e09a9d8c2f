"""Plan-quality gates (the 100 TB posture, asserted): pushdown, pruning,
broadcast, codegen.  A correct-but-slow plan fails here."""

from __future__ import annotations

from hands_on_iceberg_compression_spark.operators.workload import (
    q_count_star,
    q_eq_string,
    q_flagship,
    q_group_agg,
    q_join_broadcast,
    q_scalar_funcs,
    q_sort_limit,
)
from hands_on_iceberg_compression_spark.plans.explain import (
    assert_filter_pushdown,
    assert_scan_pruned,
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    scan_columns,
)

from tests.conftest import SF_SMALL


def test_equality_filter_pushed_to_scan(spark):
    df = q_eq_string(spark, SF_SMALL)
    assert_filter_pushdown(df, "event_type")
    # count over one predicate column must not read the whole row
    assert_scan_pruned(df, 1)


def test_flagship_pushdown_and_pruning(spark):
    df = q_flagship(spark, SF_SMALL)
    # ts and value predicates are pushdown-able; LIKE '%..%' stays a
    # post-scan filter (no prefix) — that's the expected shape
    assert_filter_pushdown(df, "ts")
    assert_filter_pushdown(df, "value")
    assert scan_columns(df) <= {"props", "ts", "value"}


def test_projection_prunes_scan(spark):
    df = q_sort_limit(spark, SF_SMALL)
    assert scan_columns(df) <= {"event_id", "value"}


def test_group_agg_partial_aggregation(spark):
    plan = formatted_plan(q_group_agg(spark, SF_SMALL))
    # map-side combine: a HashAggregate below the exchange and one above
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_star_join_broadcasts(spark):
    df = q_join_broadcast(spark, SF_SMALL)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # the fact table must not be exchanged before the joins: no shuffle
    # between scan of orders and the broadcast joins (AQE final agg shuffle ok)
    assert "SortMergeJoin" not in plan


def test_count_star_reads_no_data_columns(spark):
    df = q_count_star(spark, SF_SMALL)
    # count(*) should scan zero data columns (metadata-only row groups)
    assert len(scan_columns(df)) == 0


def test_scalar_funcs_whole_stage_codegen(spark):
    df = q_scalar_funcs(spark, SF_SMALL)
    assert codegen_stage_count(df) >= 1
