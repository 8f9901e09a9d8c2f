"""Local replica of the driver's correctness gate: run every registered query
in Spark at sf=0.01 and compare against its DuckDB oracle (row count, column
names, order-insensitive values).  Queries without an oracle get a rows-and-
schema smoke check."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from hands_on_iceberg_compression_spark.operators import all_queries
from hands_on_iceberg_compression_spark.sources.fixtures import TABLES

from tests.conftest import SF_ORACLE

QUERIES = all_queries()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    assert sorted(s.columns) == sorted(d.columns), f"{name}: column names differ"
    assert len(s) == len(d), f"{name}: row counts differ ({len(s)} vs {len(d)})"
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv):
            # exact equality on purpose — the driver's value-hash is exact,
            # so any tolerance here would hide a driver-visible mismatch
            for i, (a, b) in enumerate(zip(sv, dv)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert a == b, f"{name}: value mismatch col={c} row={i}: {a!r} != {b!r}"
        else:
            pd.testing.assert_series_equal(
                sv, dv, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, name):
    q = QUERIES[name]
    sdf = q.build(spark, SF_ORACLE)
    spdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only: stable schema, executes, deterministic across two runs
        again = q.build(spark, SF_ORACLE).toPandas()
        assert list(spdf.columns) == list(again.columns)
        assert len(spdf) == len(again)
        # the driver canonicalizes rows-only results too (pandas sort over
        # all columns) — list/dict cells kill it (CORRECTNESS_r01
        # gen_narrow_sample ERROR).  pandas can sort homogeneous-list object
        # columns without error, so a replicated sort is WEAKER than the
        # driver (ADVICE r2); assert the schema is atomic instead — the same
        # gate test_no_complex_types_in_driver_results applies registry-wide
        from pyspark.sql import types as T

        complex_fields = [
            (f.name, f.dataType.simpleString())
            for f in q.build(spark, SF_ORACLE).schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        assert not complex_fields, (
            f"{name}: complex-typed driver-facing columns {complex_fields}"
        )
        return
    _compare(spdf, _duck(q.oracle), name)
