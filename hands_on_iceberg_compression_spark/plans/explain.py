"""Physical-plan inspection helpers: assert the plan we *want*, not just one
that returns correct rows.

SURVEY.md §4: the reference delegates all optimization to Trino; our
equivalents are Catalyst facts that must hold — filters reaching the parquet
scan (PushedFilters), projections pruning the read schema (ReadSchema),
broadcast joins actually broadcasting, whole-stage codegen covering the hot
expressions.  These helpers turn `.explain("formatted")` into assertions so a
plan regression fails tests instead of silently costing 100x at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries in the scan nodes."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the columns that actually hit parquet."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries of the scan nodes (partition pruning)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_shuffle(df: DataFrame) -> bool:
    return "Exchange" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids) or len(re.findall(r"WholeStageCodegen", plan))


def assert_filter_pushdown(df: DataFrame, column: str) -> None:
    filters = pushed_filters(df)
    assert any(column in f for f in filters), (
        f"no pushed filter on {column!r}; PushedFilters={filters}"
    )


def assert_scan_pruned(df: DataFrame, max_columns: int) -> None:
    cols = scan_columns(df)
    assert len(cols) <= max_columns, (
        f"scan reads {len(cols)} columns ({sorted(cols)}), wanted <= {max_columns}"
    )
