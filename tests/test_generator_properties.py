"""Property-based generator tests (hypothesis): for arbitrary valid specs,
generated data honors bounds, lengths, and dictionaries."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.functions.generators import generate_df
from hands_on_iceberg_compression_spark.schema.specs import (
    EnumSpec,
    IntSpec,
    StringSpec,
    TableConfig,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.integers(min_value=-1000, max_value=1000),
    span=st.integers(min_value=0, max_value=5000),
    slen=st.integers(min_value=1, max_value=40),
    nvals=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_generator_properties(spark, lo, span, slen, nvals, seed):
    values = tuple(f"v{i}" for i in range(nvals))
    cfg = TableConfig(
        catalog="c",
        schema="s",
        table_base="t",
        columns={
            "id": IntSpec(min=1, max=1, kind="bigint"),
            "num": IntSpec(min=lo, max=lo + span),
            "txt": StringSpec(length=slen),
            "cat": EnumSpec(values=values),
        },
    )
    df = generate_df(spark, cfg, start_id=1, num_rows=300, seed=seed)
    row = df.agg(
        F.min("num").alias("mn"),
        F.max("num").alias("mx"),
        F.min(F.length("txt")).alias("ln_min"),
        F.max(F.length("txt")).alias("ln_max"),
        F.countDistinct("cat").alias("ncat"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.n == 300
    assert lo <= row.mn and row.mx <= lo + span
    assert row.ln_min == row.ln_max == slen
    assert row.ncat <= nvals
    bad = df.filter(~F.col("cat").isin(*values)).count()
    assert bad == 0
