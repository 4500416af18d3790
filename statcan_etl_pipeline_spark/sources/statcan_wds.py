"""StatCan Web Data Service (WDS) full-table-download ingestion.

StatCan publishes each product (PID) as a zipped CSV in a fixed long
format: one row per observation with columns REF_DATE, GEO, DGUID,
dimension members, UOM, UOM_ID, SCALAR_FACTOR, SCALAR_ID, VECTOR,
COORDINATE, VALUE, STATUS, SYMBOL, TERMINATED, DECIMALS. The ETL moves
are: type the observation records, split dimension members into
conformed dimension tables with surrogate keys, and expose
(vector, ref_date, value) series.

This module does those moves Spark-first: explicit schema (no
inference pass), dimension extraction as distinct+zipWithIndex-free
window-less hashing (dimension ids are deterministic dense ranks), and
everything lazy so Catalyst prunes unused dimension columns at scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WDS_CORE_COLUMNS = [
    "REF_DATE",
    "GEO",
    "DGUID",
    "UOM",
    "UOM_ID",
    "SCALAR_FACTOR",
    "SCALAR_ID",
    "VECTOR",
    "COORDINATE",
    "VALUE",
    "STATUS",
    "SYMBOL",
    "TERMINATED",
    "DECIMALS",
]


def wds_schema(dimension_cols: list[str]) -> T.StructType:
    """Explicit schema for a WDS csv: core columns + product dimensions
    (all read as string; VALUE/DECIMALS typed after parse)."""
    fields = [T.StructField("REF_DATE", T.StringType())]
    fields += [T.StructField(c, T.StringType()) for c in ["GEO", "DGUID"]]
    fields += [T.StructField(c, T.StringType()) for c in dimension_cols]
    fields += [
        T.StructField("UOM", T.StringType()),
        T.StructField("UOM_ID", T.StringType()),
        T.StructField("SCALAR_FACTOR", T.StringType()),
        T.StructField("SCALAR_ID", T.StringType()),
        T.StructField("VECTOR", T.StringType()),
        T.StructField("COORDINATE", T.StringType()),
        T.StructField("VALUE", T.StringType()),
        T.StructField("STATUS", T.StringType()),
        T.StructField("SYMBOL", T.StringType()),
        T.StructField("TERMINATED", T.StringType()),
        T.StructField("DECIMALS", T.StringType()),
    ]
    return T.StructType(fields)


def read_wds_csv(
    spark: SparkSession, path: str, dimension_cols: list[str]
) -> DataFrame:
    """Read + type a WDS full-table CSV. REF_DATE is monthly ('2024-01')
    or annual ('2024'); both normalize to the period's first day.
    VALUE is nullable (suppressed/confidential cells carry STATUS codes
    instead)."""
    raw = (
        spark.read.schema(wds_schema(dimension_cols))
        .options(header="true", mode="PERMISSIVE")
        .csv(path)
    )
    ref_month = F.when(
        F.length("REF_DATE") == 4, F.concat(F.col("REF_DATE"), F.lit("-01-01"))
    ).otherwise(F.concat(F.col("REF_DATE"), F.lit("-01")))
    return (
        raw.withColumn("ref_date", F.to_date(ref_month, "yyyy-MM-dd"))
        .withColumn("value", F.col("VALUE").cast("double"))
        .withColumn("decimals", F.col("DECIMALS").cast("int"))
        .withColumn("vector", F.col("VECTOR"))
        .withColumn("terminated", F.col("TERMINATED").isNotNull())
    )


def build_dimension(df: DataFrame, member_col: str, id_col: str = "member_id") -> DataFrame:
    """Conformed dimension: distinct members with deterministic dense-rank
    surrogate keys (stable across runs — no zipWithIndex/monotonic ids,
    which are partitioning-dependent)."""
    from pyspark.sql import Window as W

    w = W.orderBy(member_col)
    return (
        df.select(member_col)
        .where(F.col(member_col).isNotNull())
        .distinct()
        .withColumn(id_col, F.dense_rank().over(w).cast("long"))
    )


def latest_revision(
    df: DataFrame, series_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep only the most recent revision per series key."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*series_cols).orderBy(*[F.desc(c) for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def vector_series(df: DataFrame) -> DataFrame:
    """(vector, ref_date, value) long series, suppression-aware."""
    return df.select("vector", "ref_date", "value", "STATUS").orderBy(
        "vector", "ref_date"
    )
