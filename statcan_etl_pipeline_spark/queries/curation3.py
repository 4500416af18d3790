"""Final round-6 curation batch: shingle document-frequency spectrum
(the empirical basis for the hot-shingle cap) and scalar-quantization
error curves (how many bits does this embedding table actually need?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..functions.text import norm_text, sql_char_shingles, sql_norm_text
from ..registry import query

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Shingle document-frequency spectrum: how many distinct char-5-gram
# shingles appear in exactly-1, 2, 3–4, 5–8, … documents (power-of-2
# bins)? This is the distribution that justifies (and calibrates) the
# jaccard hot-shingle df cap: mass in high-df bins is corpus
# boilerplate, not similarity signal. Linear explode → exact distinct
# df per shingle → bounded bin census; pure integer arithmetic.
#
# r12 NOTE on the r11 map-side-dedup rewrite (ADVICE): array_distinct-
# before-explode is equivalent to the old explode + .distinct() ONLY
# because doc_id is unique in `documents` — with duplicate doc_ids the
# old global distinct would merge the duplicates' shingle rows while
# the per-row array_distinct would double-count them. The precondition
# holds by construction (scripts/gen_testdata.py emits arange doc_ids)
# and is NOT silent: the oracle keeps the global SELECT DISTINCT, so a
# duplicate doc_id would surface as a driver hash mismatch (verified:
# oracle parity MATCH at sf0.01), not as silent drift.
# ---------------------------------------------------------------------------


@query(
    "shingle_df_spectrum",
    oracle=f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({sql_char_shingles(f"({sql_norm_text('text')})", 5)}) AS s
  FROM documents
), df AS (
  SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s
), binned AS (
  -- integer bit-length, NOT floor(log2(df)): Spark computes LOG2 as
  -- ln(x)/ln(2) while DuckDB calls std::log2, and a 1-ulp difference at
  -- df = 2^k would flip the floor and shift the bin. length(bin(df))-1
  -- is integer-derived in both engines, so the bin is exact by
  -- construction.
  SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS bin, df FROM df
)
SELECT bin,
       CAST(power(2, bin) AS BIGINT) AS df_from,
       CAST(power(2, bin + 1) - 1 AS BIGINT) AS df_to,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(df) AS BIGINT) AS occurrences
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def shingle_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_shingles

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("norm")
    )
    # r11: per-(doc, shingle) dedup happens MAP-SIDE via array_distinct
    # before the explode — identical semantics to exploding then
    # .distinct() (the dedup key was (doc_id, s) and every row of one
    # doc's array is in one task), but it removes a full shuffle of the
    # ~100M-row exploded shingle stream (sf1: the .distinct() exchange
    # was the single widest in the plan); groupBy(s) is now the only
    # wide exchange.
    sh = (
        docs.withColumn("shingles", F.array_distinct(char_shingles("norm", 5)))
        .select("doc_id", F.explode("shingles").alias("s"))
    )
    df = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # integer bit-length (length(bin(df)) - 1), mirroring the oracle: no
    # math-library log2 in either engine, so power-of-two df values can
    # never straddle a bin boundary by 1 ulp.
    binned = df.select(
        (F.length(F.bin("df")) - 1).cast("long").alias("bin"), "df"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("occurrences"),
        )
        .select(
            "bin",
            F.pow(F.lit(2.0), F.col("bin").cast("double")).cast("long").alias("df_from"),
            (F.pow(F.lit(2.0), (F.col("bin") + 1).cast("double")) - 1)
            .cast("long")
            .alias("df_to"),
            "n_shingles",
            "occurrences",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Scalar-quantization error curve: reconstruct every embedding at
# 4/6/8 bits per dimension (per-dimension min/max ranges — exactly the
# calibration embedding_dim_stats reports) and measure reconstruction
# MSE. Codes are exact integers (floor of identical doubles); each
# element's squared error is re-quantized to 1e-12 fixed point so the
# corpus sum is exact — the bits-vs-quality table is engine-exact.
# Dimension ranges are a 64-row broadcast; everything else is one
# linear pass per bit width.
# ---------------------------------------------------------------------------

_SQ_BITS = (4, 6, 8)


def _sq_err_sql(bits: int) -> str:
    scale = (1 << bits) - 1
    code = (
        f"CAST(floor((CAST(e.embedding[t.i] AS DOUBLE) - r.mn)"
        f" / (r.mx - r.mn) * {scale}.0 + 0.5) AS BIGINT)"
    )
    recon = f"(r.mn + CAST({code} AS DOUBLE) * (r.mx - r.mn) / {scale}.0)"
    d = f"(CAST(e.embedding[t.i] AS DOUBLE) - {recon})"
    return f"CAST(floor({d} * {d} * 1000000000000.0 + 0.5) AS HUGEINT)"


def _sq_oracle() -> str:
    branches = " UNION ALL ".join(
        f"""
SELECT CAST({bits} AS BIGINT) AS bits,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum({_sq_err_sql(bits)}) AS HUGEINT) AS err_pico
FROM embeddings e
CROSS JOIN range(1, 65) t(i)
JOIN rng r ON r.dim = t.i
WHERE r.mx > r.mn"""
        for bits in _SQ_BITS
    )
    return f"""
WITH rng AS (
  SELECT i AS dim, min(CAST(embedding[i] AS DOUBLE)) AS mn,
         max(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM embeddings CROSS JOIN range(1, 65) t(i)
  GROUP BY i
)
SELECT bits, n_values,
       {R("CAST(err_pico AS DOUBLE) / 1000000000000.0 / CAST(n_values AS DOUBLE)", 9)}
         AS mse
FROM ({branches})
ORDER BY bits
"""


@query("embedding_sq_error_curve", oracle=_sq_oracle())
def embedding_sq_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim0", "xf")).select(
        (F.col("dim0") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    rng = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    base = ex.join(F.broadcast(rng), "dim").filter(F.col("mx") > F.col("mn"))

    outs = []
    for bits in _SQ_BITS:
        scale = float((1 << bits) - 1)
        code = F.floor(
            (F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * F.lit(scale)
            + F.lit(0.5)
        ).cast("long")
        recon = F.col("mn") + code.cast("double") * (
            F.col("mx") - F.col("mn")
        ) / F.lit(scale)
        d = F.col("x") - recon
        err_pico = F.floor(d * d * F.lit(1e12) + F.lit(0.5)).cast(_DEC)
        outs.append(
            base.agg(
                F.lit(bits).cast("long").alias("bits"),
                F.count(F.lit(1)).cast("long").alias("n_values"),
                F.sum(err_pico).alias("err_pico"),
            )
        )
    un = outs[0]
    for o in outs[1:]:
        un = un.unionByName(o)
    return un.select(
        "bits",
        "n_values",
        pround(
            F.col("err_pico").cast("double")
            / F.lit(1e12)
            / F.col("n_values").cast("double"),
            9,
        ).alias("mse"),
    ).orderBy("bits")
