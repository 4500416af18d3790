"""Multimodal plumbing query: binary payload + metadata, oracle-checked
(the Arrow/mapInPandas decode stub is exercised in tests/test_multimodal.py)."""

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
