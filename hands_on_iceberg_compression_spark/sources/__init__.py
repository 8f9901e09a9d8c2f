from hands_on_iceberg_compression_spark.sources.fixtures import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
