"""D11/D12 (SURVEY.md §2-D): catalog introspection + system probes via
spark.sql — the reference's SHOW CATALOGS/SCHEMAS/TABLES, DESCRIBE, SELECT 1
session (temp.md:6-12, README.md:42-49)."""

from __future__ import annotations

from hands_on_iceberg_compression_spark.sources.fixtures import TABLES, register_views

from tests.conftest import SF_SMALL


def test_select_one_probe(spark):
    assert spark.sql("SELECT 1 AS one").collect()[0]["one"] == 1
    assert spark.version.startswith("4.")


def test_show_tables_lists_fixtures(spark):
    register_views(spark, SF_SMALL)
    shown = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert set(TABLES) <= shown


def test_describe_table(spark):
    register_views(spark, SF_SMALL)
    cols = {r.col_name: r.data_type for r in spark.sql("DESCRIBE lineitem").collect()}
    assert cols["l_orderkey"] == "bigint"
    assert cols["l_quantity"] == "double"
    assert cols["l_returnflag"] == "string"
    # Spark 4 reads parquet isAdjustedToUTC=false as TIMESTAMP_NTZ
    assert cols["l_shipdate"] in ("timestamp", "timestamp_ntz")
