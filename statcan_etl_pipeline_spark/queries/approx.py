"""Approximate aggregates — the 100 TB substitutes for exact distinct
counts and percentiles. Sketch internals differ per engine, so these
are rows-only for the driver; tests/test_approx.py bounds their error
against the exact answers.

- approx_count_distinct: HyperLogLog++ (rsd 2%) — constant memory vs
  the O(distinct) hash set an exact count needs per group.
- percentile_approx: Greenwald-Khanna — single pass, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import sql_round
from ..registry import query


@query("approx_distinct_parts_by_flag")  # rows-only: HLL sketch is engine-specific
def approx_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@query("approx_quantiles_order_value")  # rows-only: GK sketch is engine-specific
def approx_quantiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (round 2): UNLIKE the HLL/GK sketches above, this one
# is built from first principles with md5-derived hash rows, so it IS
# engine-portable and fully oracle-checked. d=4 hash rows × w=256
# buckets; estimate(word) = min over rows of its bucket count. The
# one-sided error guarantee (estimate ≥ exact, overshoot ≤ εN with
# prob 1−δ) is asserted in tests/test_approx.py.
#
# Scale story: the sketch build is one groupBy over (row, bucket) —
# d×w = 1024 counters TOTAL regardless of corpus size, where an exact
# frequency table needs O(vocabulary) state per executor.
# ---------------------------------------------------------------------------
CMS_D = 4    # hash rows
# bucket id from two hex chars of md5 via ascii() — injective on the
# 16-char hex alphabet in BOTH engines, so w = 256 effective buckets
_CMS_BUCKET = "(ascii(substr(md5('cms{d}:' || {col}), 1, 1)) * 128 + ascii(substr(md5('cms{d}:' || {col}), 2, 1)))"

# single source of truth for tokenization: functions/text.py (the Spark
# side uses norm_text/tokens — a drifting hand-inlined copy here would
# silently flake the oracle hash)
from ..functions.text import sql_norm_text, sql_tokens  # noqa: E402

_CMS_TOKS = (
    f"SELECT unnest({sql_tokens(sql_norm_text('text'))}) AS word FROM documents"
)


def _cms_bucket_sql(col: str, d: int) -> str:
    return _CMS_BUCKET.format(d=d, col=col)


@query(
    "cms_word_frequency",
    oracle=f"""
WITH toks AS ({_CMS_TOKS}),
cms AS (
  {" UNION ALL ".join(f"SELECT {d} AS row_id, {_CMS_BUCKET.format(d=d, col='word')} AS bucket, count(*) AS n FROM toks GROUP BY bucket" for d in range(CMS_D))}
),
exact AS (SELECT word, count(*) AS exact_n FROM toks GROUP BY word),
wb AS (
  {" UNION ALL ".join(f"SELECT word, exact_n, {d} AS row_id, {_CMS_BUCKET.format(d=d, col='word')} AS bucket FROM exact" for d in range(CMS_D))}
)
SELECT word, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(min(n) AS BIGINT) AS cms_n
FROM wb JOIN cms USING (row_id, bucket)
GROUP BY word, exact_n
ORDER BY word
""",
)
def cms_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import scatter
    from ..functions.text import norm_text, tokens

    docs = scatter(spark, load_table(spark, sf_dir, "documents")).withColumn(
        "norm", norm_text("text")
    )
    toks = docs.select(F.explode(tokens("norm")).alias("word"))

    def bucket(col: str, d: int) -> F.Column:
        return F.expr(_cms_bucket_sql(col, d))

    cms = None
    for d in range(CMS_D):
        part = (
            toks.select(F.lit(d).alias("row_id"), bucket("word", d).alias("bucket"))
            .groupBy("row_id", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cms = part if cms is None else cms.unionByName(part)
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    wb = None
    for d in range(CMS_D):
        part = exact.select(
            "word", "exact_n", F.lit(d).alias("row_id"), bucket("word", d).alias("bucket")
        )
        wb = part if wb is None else wb.unionByName(part)
    return (
        wb.join(F.broadcast(cms), ["row_id", "bucket"])
        .groupBy("word", "exact_n")
        .agg(F.min("n").cast("long").alias("cms_n"))
        .select("word", F.col("exact_n").cast("long").alias("exact_n"), "cms_n")
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch (round 2): like the CMS
# above, built from md5 so it is deterministic and FULLY oracle-checked
# (approx_count_distinct's HLL sketch is engine-private; this one isn't).
# Estimator: with h = 32-bit-normalized md5 of the key and h_k the k-th
# smallest distinct hash in a group, E[distinct] ≈ (k-1)·2^32 / h_k.
# Groups with ≤ k distinct hashes are exact by construction.
#
# Scale story: per group the state is a bounded k-item min-heap (here:
# window top-k), vs the O(distinct) set an exact count carries.
# ---------------------------------------------------------------------------
KMV_K = 64
_KMV_EST_SQL = (
    f"(CASE WHEN n_h < {KMV_K} THEN CAST(n_h AS DOUBLE) "
    f"ELSE ({KMV_K} - 1.0) * 4294967296.0 / CAST(h_k AS DOUBLE) END)"
)


def _hex32_sql(h: str) -> str:
    """First 8 hex chars of md5 column `h` as a BIGINT — ascii-based
    digit math only, so the expression parses in Spark SQL AND DuckDB."""
    return "(" + " + ".join(
        f"CAST(ascii(substr({h}, {i + 1}, 1)) - "
        f"CASE WHEN ascii(substr({h}, {i + 1}, 1)) >= 97 THEN 87 ELSE 48 END AS BIGINT)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ) + ")"


@query(
    "kmv_distinct_parts",
    oracle=f"""
WITH hashes AS (
  SELECT DISTINCT l_returnflag,
         {_hex32_sql("md5('kmv:' || CAST(l_partkey AS VARCHAR))")} AS h
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n_h
  FROM hashes
), kth AS (
  SELECT l_returnflag, h AS h_k, n_h FROM ranked
  WHERE rn = CASE WHEN n_h < {KMV_K} THEN n_h ELSE {KMV_K} END
), exact AS (
  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct FROM lineitem
  GROUP BY l_returnflag
)
SELECT k.l_returnflag,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       {sql_round(_KMV_EST_SQL, 2)} AS kmv_estimate
FROM kth k JOIN exact e ON k.l_returnflag = e.l_returnflag
ORDER BY k.l_returnflag
""",
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.portable import pround

    li = load_table(spark, sf_dir, "lineitem")
    h = F.expr(_hex32_sql("md5('kmv:' || CAST(l_partkey AS STRING))"))
    hashes = li.select("l_returnflag", h.alias("h")).distinct()
    wrank = W.partitionBy("l_returnflag").orderBy("h")
    wall = W.partitionBy("l_returnflag")
    ranked = hashes.select(
        "l_returnflag",
        "h",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_h"),
    )
    kth = ranked.filter(
        F.col("rn")
        == F.when(F.col("n_h") < KMV_K, F.col("n_h")).otherwise(F.lit(KMV_K))
    ).select("l_returnflag", F.col("h").alias("h_k"), "n_h")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_h") < KMV_K, F.col("n_h").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(4294967296.0) / F.col("h_k").cast("double")
    )
    return (
        kth.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            pround(est, 2).alias("kmv_estimate"),
        )
        .orderBy("l_returnflag")
    )
