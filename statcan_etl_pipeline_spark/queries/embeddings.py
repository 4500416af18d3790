"""Embedding-column profiling (round 2): per-label norm statistics.

A vector store ingesting 100 TB of embeddings needs cheap corpus
profiling (dimension sanity, norm distribution per label/partition)
before any ANN indexing. Norms reuse the fixed-point dot product from
functions/vectors.py, so every per-vector norm double is bit-identical
across engines; the per-label average is computed from an exact
micro-unit integer sum (never an average of raw doubles — accumulation
order would flip the hash; see functions/portable.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, scatter
from ..functions.portable import pround, sql_round as R
from ..functions.vectors import dot_fixed, sql_dot_fixed
from ..registry import query

_NORM_SQL = f"sqrt({sql_dot_fixed('embedding', 'embedding')} / 1000000000.0)"


@query(
    "embedding_norm_stats",
    oracle=f"""
WITH v AS (
  SELECT label,
         len(embedding) AS dim,
         {_NORM_SQL} AS nrm
  FROM embeddings
), m AS (
  SELECT label,
         count(*) AS n_vecs,
         min(dim) AS min_dim,
         max(dim) AS max_dim,
         CAST(sum(CAST(floor(nrm * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
         min(nrm) AS min_nrm,
         max(nrm) AS max_nrm
  FROM v GROUP BY label
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(min_dim AS BIGINT) AS min_dim,
       CAST(max_dim AS BIGINT) AS max_dim,
       {R("(CAST(sum_micro AS DOUBLE) / 1000000.0 / CAST(n_vecs AS DOUBLE))", 6)} AS avg_norm,
       {R("min_nrm", 6)} AS min_norm,
       {R("max_nrm", 6)} AS max_norm
FROM m
ORDER BY label
""",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(dot_fixed("embedding", "embedding") / F.lit(1e9))
    v = emb.select(
        "label", F.size("embedding").alias("dim"), nrm.alias("nrm")
    )
    m = v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.sum(F.floor(F.col("nrm") * F.lit(1e6) + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_micro"),
        F.min("nrm").alias("min_nrm"),
        F.max("nrm").alias("max_nrm"),
    )
    return m.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.col("min_dim").cast("long").alias("min_dim"),
        F.col("max_dim").cast("long").alias("max_dim"),
        pround(
            F.col("sum_micro").cast("double")
            / F.lit(1e6)
            / F.col("n_vecs").cast("double"),
            6,
        ).alias("avg_norm"),
        pround("min_nrm", 6).alias("min_norm"),
        pround("max_nrm", 6).alias("max_norm"),
    ).orderBy("label")
