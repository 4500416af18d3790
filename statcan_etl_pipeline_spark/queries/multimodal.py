"""Multimodal plumbing query: binary payload + metadata, oracle-checked
(the Arrow/mapInPandas decode stub is exercised in tests/test_operators.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import attach_binary_payload
from ..registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       'text/fake' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
ORDER BY doc_id
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.digest").alias("digest"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal catalog rollup (round 2): a typed media catalog aggregated
# per kind × source. Kind is a deterministic doc_id-hash assignment
# standing in for real MIME sniffing (no media libs in this container);
# byte sizes are exact integers so the aggregate is hash-stable.
# ---------------------------------------------------------------------------
@query(
    "multimodal_kind_catalog",
    oracle="""
WITH media AS (
  SELECT doc_id, source,
         CASE doc_id % 3 WHEN 0 THEN 'image/fake'
                         WHEN 1 THEN 'audio/fake'
                         ELSE 'video/fake' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS digest
  FROM documents
)
SELECT kind, source,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(min(n_bytes) AS BIGINT) AS min_bytes,
       CAST(max(n_bytes) AS BIGINT) AS max_bytes,
       CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_payloads
FROM media
GROUP BY kind, source
ORDER BY kind, source
""",
)
def multimodal_kind_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image/fake")
        .when(F.col("doc_id") % 3 == 1, "audio/fake")
        .otherwise("video/fake")
    )
    media = docs.select(
        kind.alias("kind"),
        "source",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.digest").alias("digest"),
    )
    return (
        media.groupBy("kind", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("n_bytes").cast("long").alias("min_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
            F.countDistinct("digest").cast("long").alias("n_distinct_payloads"),
        )
        .orderBy("kind", "source")
    )
