"""Corpus-curation round 2: cross-document repeated-chunk scan (the
chunk-granular "exact substring dedup" of an LLM training pipeline)
and per-dimension embedding calibration stats (the input to scalar
quantization / clipping decisions).

Scale notes (100 TB): chunking is a linear explode (no pairwise work);
chunk frequencies are a two-stage exact-distinct aggregate on the
16-byte fingerprint; the join back to occurrences is an equi-join on
the same key. Dimension stats shuffle only (dim → 64 keys) after
map-side partial aggregation; all moment sums are exact fixed-point
integers so cross-engine doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..functions.text import norm_text, sql_norm_text
from ..registry import query

_DEC = "decimal(38,0)"
_CHUNK = 8  # tokens per non-overlapping chunk


# ---------------------------------------------------------------------------
# Cross-document repeated-chunk scan: split each document into
# non-overlapping 8-token chunks, fingerprint each chunk (md5), count
# distinct documents per fingerprint, and report each document's
# duplicated-chunk fraction — the chunk-level exact-dedup signal used
# to strip boilerplate/mirrored spans before training. Linear in
# corpus size: explode → groupBy(fp) → join(fp); never compares texts
# pairwise.
# ---------------------------------------------------------------------------


@query(
    "interdoc_chunk_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {sql_norm_text("text")} AS norm FROM documents
), tk AS (
  SELECT doc_id, string_split(norm, ' ') AS toks FROM base
), ch AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(toks[(i * {_CHUNK} + 1):(i * {_CHUNK} + {_CHUNK})], ' ')) AS fp
  FROM tk, unnest(range(0, len(toks) // {_CHUNK})) AS t(i)
  WHERE len(toks) >= {_CHUNK}
), freq AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM ch GROUP BY fp
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       {R("CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS dup_ratio
FROM ch c JOIN freq f USING (fp)
GROUP BY c.doc_id
""",
)
def interdoc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("norm")
    )
    tk = docs.select("doc_id", F.split("norm", " ").alias("toks")).filter(
        F.size("toks") >= _CHUNK
    )
    ch = tk.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.size("toks") / _CHUNK).cast("long") - 1),
                lambda i: F.struct(
                    i.alias("chunk_idx"),
                    F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("toks"), i * _CHUNK + 1, _CHUNK)
                        ).cast("binary")
                    ).alias("fp"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.fp").alias("fp"))
    freq = ch.groupBy("fp").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    dup = F.when(F.col("df") > 1, 1).otherwise(0)
    return (
        ch.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            pround(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double"),
                4,
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding calibration stats (n, mean, std, min, max
# per coordinate) — what a scalar-quantizer or clipping pass reads
# first. Values are quantized to 1e-9 fixed point per element (the
# vectors.py convention) so Σq and Σq² are exact integers; mean and
# population std are single double divisions at the end.
# ---------------------------------------------------------------------------

_Q = (
    "CASE WHEN x >= 0 THEN CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT) "
    "ELSE -CAST(floor((-x) * 1000000000.0 + 0.5) AS BIGINT) END"
)


@query(
    "embedding_dim_stats",
    oracle=f"""
WITH ex AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), q AS (
  SELECT dim, x, {_Q} AS qx FROM ex
), g AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(qx AS HUGEINT)) AS HUGEINT) AS sq,
         CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT) AS sq2,
         min(x) AS mn, max(x) AS mx
  FROM q GROUP BY dim
)
SELECT dim, n,
       {R("CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)", 6)} AS mean,
       {R("sqrt(CAST(n * sq2 - sq * sq AS DOUBLE)) / (CAST(n AS DOUBLE) * 1000000000.0)", 6)} AS std,
       {R("mn", 6)} AS vmin,
       {R("mx", 6)} AS vmax
FROM g
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        F.col("dim").cast("long").alias("dim"), F.col("xf").cast("double").alias("x")
    )
    x = F.col("x")
    qx = (
        F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
        .otherwise(-F.floor((-x) * F.lit(1e9) + F.lit(0.5)))
        .cast("long")
    )
    g = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(qx.cast(_DEC)).alias("sq"),
        F.sum((qx * qx).cast(_DEC)).alias("sq2"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    n_d = F.col("n").cast("double")
    return g.select(
        "dim",
        "n",
        pround(F.col("sq").cast("double") / (n_d * F.lit(1e9)), 6).alias("mean"),
        pround(
            F.sqrt(
                (F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq")).cast("double")
            )
            / (n_d * F.lit(1e9)),
            6,
        ).alias("std"),
        pround(F.col("mn"), 6).alias("vmin"),
        pround(F.col("mx"), 6).alias("vmax"),
    )
