"""Batch format connectors: parquet / CSV / JSON / ORC read+write with one
surface.

The reference's only non-parquet I/O is the CSV results file (plot.ts:54-58,
D15) and the Iceberg format enum ("PARQUET" | "ORC" | "AVRO", types.ts:35).
Here every format is a first-class source/sink so a user can land fixture
extracts or ingest external drops without leaving the engine.

Scale notes: schema is always passed explicitly for text formats (CSV/JSON
schema inference reads the data twice — never at 100 TB); compression
defaults match the warehouse codec conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json", "orc")
# AVRO completes the reference's format enum ("PARQUET"|"ORC"|"AVRO",
# types.ts:35) but needs the external spark-avro module, which is not on
# this container's classpath (no network; probe below).  When the jar is
# present, avro becomes a first-class member of the same read/write surface.
OPTIONAL_FORMATS = ("avro",)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source resolves (jar on classpath).

    Class-presence alone lies here: avro-* core jars ship with Spark while
    the DataSourceRegister entry lives in the external spark-avro module,
    so we ask Spark's own source lookup."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, fmt: str = "parquet", compression: str | None = None, **options) -> None:
    if fmt not in FORMATS + OPTIONAL_FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS + OPTIONAL_FORMATS}")
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | str | None = None, **options
) -> DataFrame:
    if fmt not in FORMATS + OPTIONAL_FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS + OPTIONAL_FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        # header-only inference is cheap; full type inference is not — callers
        # at scale pass the schema
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.format(fmt).load(path)
