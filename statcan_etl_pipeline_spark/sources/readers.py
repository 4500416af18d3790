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


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read that SPLITS clean rows from malformed ones
    (the quarantine/dead-letter pattern): returns (good, bad). Bad rows
    keep the raw line in `corrupt_col` for replay/debugging instead of
    silently nulling (PERMISSIVE default) or dropping (DROPMALFORMED) —
    at pipeline scale you always want the reject counts observable.

    NB: Spark requires the corrupt-record column to be part of the
    declared schema, and referencing ONLY the corrupt column needs a
    cache/materialization barrier — hence the .cache() here (bounded:
    only malformed rows are retained after the split).
    """
    base = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    with_corrupt = base.add(corrupt_col, "string")
    df = (
        spark.read.schema(with_corrupt)
        .options(
            header=str(header).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt_col,
            **options,
        )
        .csv(path)
        .cache()
    )
    from pyspark.sql import functions as F

    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: mergeSchema unions the schemas of all
    files under `path`, so columns added by newer pipeline versions
    appear (null-filled for old files). Costs a footer read per file —
    fine for a partition directory, so prefer a catalog-stored schema
    for full-table scans at 100 TB."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON twin of read_csv_with_quarantine: (good, bad) split with the
    raw malformed line preserved for replay."""
    base = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    with_corrupt = base.add(corrupt_col, "string")
    df = (
        spark.read.schema(with_corrupt)
        .options(
            mode="PERMISSIVE", columnNameOfCorruptRecord=corrupt_col, **options
        )
        .json(path)
        .cache()
    )
    from pyspark.sql import functions as F

    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad
