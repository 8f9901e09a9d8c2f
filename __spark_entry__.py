"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``hands_on_iceberg_compression_spark``; this module
only adapts the operator registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hands_on_iceberg_compression_spark.operators import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference temp.md:99-105 shape: LIKE AND BETWEEN AND
    numeric ``<`` → COUNT) on /root/testdata/sf0.001."""
    from hands_on_iceberg_compression_spark.operators.workload import q_flagship

    return q_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin per query; omitted for engine-hash / approximate /
    Python-path operators (driver records rows-only checks for those)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
