"""PySpark-native analytics engine with the capabilities of the reference
``damir-manapov/hands-on-iceberg-compression`` benchmark harness, rebuilt
Spark-first.

The reference (see SURVEY.md) is a TypeScript harness that drives Trino over
Iceberg: a synthetic-data-generation DSL, table lifecycle management with
per-variant Parquet compression codecs, batched checkpointed bulk loading,
compaction, storage metrology from table metadata, a documented ad-hoc query
workload, and CSV/SVG reporting.  This package re-expresses all of that as
idiomatic PySpark (DataFrame/SQL, Catalyst-optimized, whole-stage codegen) and
adds large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB-scale execution.

Layout:
    schema/     FieldSpec DSL + reference-derived schemas (reference src/types.ts)
    functions/  column-expression compilers, deterministic PRNG, text/vector fns
    sources/    fixture loaders + Parquet/Iceberg warehouse abstraction
    operators/  query workload, dedup, similarity, text, multimodal operators
    pipeline/   load, compaction, metrology, bench, reporting
    plans/      plan-inspection helpers (pushdown/codegen assertions)
    streaming/  Structured Streaming analogues of the event pipeline
"""

from hands_on_iceberg_compression_spark.session import make_session

__version__ = "0.1.0"

__all__ = ["make_session", "__version__"]
