from hands_on_iceberg_compression_spark.schema.specs import (
    ArraySpec,
    BigintSpec,
    DateSpec,
    DoubleSpec,
    EnumSpec,
    FieldSpec,
    IntSpec,
    StringSpec,
    TableConfig,
    TimestampSpec,
)

__all__ = [
    "ArraySpec",
    "BigintSpec",
    "DateSpec",
    "DoubleSpec",
    "EnumSpec",
    "FieldSpec",
    "IntSpec",
    "StringSpec",
    "TableConfig",
    "TimestampSpec",
]
