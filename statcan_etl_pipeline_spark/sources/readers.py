"""Schema-enforced readers. Always pass an explicit schema in
production paths — schema inference is a full extra pass over the data
(fatal at 100 TB) and type-unstable across files."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode="PERMISSIVE", **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)
