"""Arrow-batched Python operators: scalar pandas_udf and grouped
applyInPandas.

Completes the engine's Python-path API surface (mapInPandas lives in
multimodal.py, applyInPandasWithState in streaming/).  These exist to
*demonstrate the sanctioned slow path*: when logic genuinely can't be a
built-in expression, Arrow batches + pandas beat row-at-a-time Python UDFs
by 10-100x.  Both operators here are chosen to be oracle-checkable — their
pandas math (ddof=1 std, mean) has exact SQL equivalents.

Scale notes: pandas_udf is a per-batch vectorized map (no shuffle);
applyInPandas shuffles by the group key and each group must fit in one
executor's memory — fine for per-user groups (hundreds of rows), the classic
misuse is grouping by a low-cardinality key at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table


@pandas_udf(T.IntegerType())
def _token_count_udf(texts: pd.Series) -> pd.Series:
    return texts.str.split(" ").map(len).astype("int32")


def q_token_count_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas_udf twin of text_token_stats' JVM tokenizer — same
    result, Arrow-vectorized Python path."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", _token_count_udf(F.col("text")).alias("n_tokens"))


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # == stddev_samp
    if pd.isna(sd) or sd == 0:
        # stddev_samp of a 1-row group is NULL in SQL; division by NULL/0
        # yields NULL — mirror that exactly so the oracle agrees
        z = pd.Series([None] * len(pdf), dtype="float64")
    else:
        z = ((pdf["value"] - mu) / sd).round(4)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "zscore": z,
        }
    )


def q_zscore_per_user(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped applyInPandas: per-user z-score of event values.  Oracle is
    the equivalent SQL window expression (avg/stddev_samp OVER user)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
    )


QUERIES: dict[str, Query] = {
    "token_count_pandas_udf": Query(
        q_token_count_pandas,
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens "
        "FROM documents",
        "scalar pandas_udf tokenizer (Arrow-vectorized Python path)",
    ),
    "zscore_per_user": Query(
        q_zscore_per_user,
        "SELECT user_id, event_id, round((value - avg(value) OVER w) / "
        "stddev_samp(value) OVER w, 4) AS zscore FROM events "
        "WINDOW w AS (PARTITION BY user_id)",
        "grouped applyInPandas per-user z-score (oracle: SQL window)",
    ),
}
