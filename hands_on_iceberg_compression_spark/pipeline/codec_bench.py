"""EP1 orchestrator: DDL -> load -> optimize -> probe -> measure -> report.

Parity: reference ``src/commands/bench.ts:170-329`` (main), with the codec x
level matrix of ``src/config/codecs.ts`` (active: zstd l6; full commented
matrix zstd{1,3,6,9} gzip{1,6,9} snappy lz4).

The variant loop materializes the SAME generated rows (deterministic
hash-of-id generators, fixed seed) under each compression variant, then
measures bytes/row — so codec comparisons are apples-to-apples, which the
reference's unseeded random() could not guarantee.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from hands_on_iceberg_compression_spark.pipeline.load import LoadPlan, load_table
from hands_on_iceberg_compression_spark.pipeline.metrology import (
    SizeRow,
    console_table,
    measure_sizes,
    write_csv,
)
from hands_on_iceberg_compression_spark.schema.specs import TableConfig
from hands_on_iceberg_compression_spark.sources.warehouse import (
    ParquetWarehouse,
    variant_table_name,
)

# codecs.ts:3-12 — active row + the commented-out full matrix
ACTIVE_CODEC_LEVELS: list[tuple[str, int | None]] = [("zstd", 6)]
FULL_CODEC_LEVELS: list[tuple[str, int | None]] = [
    ("zstd", 1), ("zstd", 3), ("zstd", 6), ("zstd", 9),
    ("gzip", 1), ("gzip", 6), ("gzip", 9),
    ("snappy", None), ("lz4", None),
]


@dataclass
class BenchResult:
    sizes: list[SizeRow]
    loads: dict[str, dict] = field(default_factory=dict)
    csv_path: str | None = None


def run_codec_bench(
    spark: SparkSession,
    warehouse: ParquetWarehouse,
    config: TableConfig,
    plan: LoadPlan,
    codec_levels: list[tuple[str, int | None]] | None = None,
    csv_path: str | None = None,
    verbose: bool = True,
) -> BenchResult:
    codec_levels = codec_levels or ACTIVE_CODEC_LEVELS
    if plan.create_base_schema:
        warehouse.create_schema(config.schema)  # B1

    result = BenchResult(sizes=[])
    for codec, level in codec_levels:
        table = variant_table_name(config.table_base, codec, level)  # B7
        warehouse.create_table(
            config.schema,
            table,
            codec,
            level,
            config.table_properties,
            partitioning=config.partitioning,  # B6 — declared config is honored
        )  # B3/B4
        stats = load_table(spark, warehouse, config, table, plan)  # C1-C5
        result.loads[table] = stats
        if plan.compact_after_load:
            warehouse.optimize(config.schema, table)  # C6
        example = warehouse.select_example(config.schema, table)  # C9
        if verbose and example:
            print(f"  {table}: example id={example[0].get(config.id_column)}")
        result.sizes.append(measure_sizes(warehouse, config.schema, table, codec, level))  # C7

    if verbose:
        print(console_table(result.sizes))  # C13
    if csv_path:
        result.csv_path = write_csv(result.sizes, csv_path)  # C12
    return result
