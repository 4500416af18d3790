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
    )


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


# ---------------------------------------------------------------------------
# Frame catalog (round 6): the frame-sampling mapInPandas path under a
# FULL content oracle — every sampled frame's bytes are checked, not
# just the plumbing shape. fake_frame_sample slices every stride-th
# byte window (the ffmpeg stand-in; same fan-out as real frame
# extraction); the Python side emits md5(upper-hex(frame bytes)),
# which DuckDB reproduces as md5(substring(hex(encode(text)), ...))
# — blob slicing isn't portable, hex-string slicing is. Runs over a
# deterministic ~14% doc sample (Python is the slow path; the demo
# bounds it like udtf_token_positions does).
# ---------------------------------------------------------------------------
_FRAME_STRIDE = 16
_FRAME_MAX = 4


@query(
    "multimodal_frame_catalog",
    oracle=f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents WHERE doc_id % 7 = 0
), sized AS (
  SELECT doc_id, h,
         least({_FRAME_MAX}, greatest(length(h) // {2 * _FRAME_STRIDE}, 1)) AS n_frames
  FROM m
), f AS (
  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         substring(h, CAST(i * {2 * _FRAME_STRIDE} + 1 AS BIGINT), {2 * _FRAME_STRIDE}) AS fh
  FROM sized CROSS JOIN range(0, {_FRAME_MAX}) t(i)
  WHERE i < n_frames
)
SELECT doc_id, frame_idx,
       CAST(length(fh) // 2 AS BIGINT) AS n_bytes,
       md5(fh) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import fake_frame_sample

    docs = attach_binary_payload(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    )
    frames = fake_frame_sample(
        docs.select("doc_id", "payload"),
        stride=_FRAME_STRIDE,
        max_frames=_FRAME_MAX,
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame").cast("long").alias("n_bytes"),
        F.md5(F.upper(F.hex("frame")).cast("binary")).alias("frame_md5"),
    )
