"""Query/operator registry.

Every operator exposes a ``Query``: a DataFrame builder ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle string over the same
parquet fixtures.  ``all_queries()`` is the single registry consumed by
``__spark_entry__.py`` (the driver contract) and by ``bench.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


def all_queries() -> dict[str, Query]:
    from hands_on_iceberg_compression_spark.operators import (
        advanced,
        dedup,
        functions_battery,
        multimodal,
        pandas_ops,
        similarity,
        temporal,
        textops,
        workload,
    )

    out: dict[str, Query] = {}
    for mod in (
        workload,
        advanced,
        temporal,
        functions_battery,
        dedup,
        similarity,
        textops,
        multimodal,
        pandas_ops,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
