"""Corpus dataset card: the single-row summary a dataset release
ships with (docs, tokens, vocabulary, languages, sources,
type-token ratio, length profile) — all from one pass over the
documents table plus one vocabulary aggregate, crossJoined as
broadcast singletons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_cents, sql_round as R
from ..functions.text import norm_text, sql_norm_text
from ..registry import query


@query(
    "corpus_dataset_card",
    oracle=f"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         string_split({sql_norm_text("text")}, ' ') AS toks
  FROM documents
), doc_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
         CAST(min(len(toks)) AS BIGINT) AS min_tokens,
         CAST(max(len(toks)) AS BIGINT) AS max_tokens
  FROM base
), vocab AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab_size
  FROM (SELECT unnest(toks) AS w FROM base)
)
SELECT d.n_docs, d.n_langs, d.n_sources, d.total_chars, d.total_tokens,
       d.min_tokens, d.max_tokens, v.vocab_size,
       {R("CAST(d.total_tokens AS DOUBLE) / CAST(d.n_docs AS DOUBLE)", 4)}
         AS mean_tokens_per_doc,
       {R("CAST(v.vocab_size AS DOUBLE) / CAST(d.total_tokens AS DOUBLE)", 6)}
         AS type_token_ratio
FROM doc_stats d, vocab v
""",
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.split(norm_text("text"), " ").alias("toks"),
    )
    doc_stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.size("toks")).cast("long").alias("total_tokens"),
        F.min(F.size("toks")).cast("long").alias("min_tokens"),
        F.max(F.size("toks")).cast("long").alias("max_tokens"),
    )
    vocab = (
        base.select(F.explode("toks").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("vocab_size"))
    )
    return doc_stats.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_chars",
        "total_tokens",
        "min_tokens",
        "max_tokens",
        "vocab_size",
        pround(
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"), 4
        ).alias("mean_tokens_per_doc"),
        pround(
            F.col("vocab_size").cast("double") / F.col("total_tokens").cast("double"),
            6,
        ).alias("type_token_ratio"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: what fraction of all token OCCURRENCES do
# the top-10/100/1000 vocabulary words cover? The top-k set comes from
# an ordered LIMIT (TakeOrdered with a lexical tie-break — never a
# global rank window over the unbounded vocabulary), the cumulative
# rank window runs over the bounded 1000-row top set, and totals are a
# broadcast singleton. Exact integer counts, one division per row.
# ---------------------------------------------------------------------------


@query(
    "vocab_coverage_curve",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split({sql_norm_text("text")}, ' ')) AS w FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab
), top AS (
  SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk
  FROM vocab ORDER BY c DESC, w LIMIT 1000
), cum AS (
  SELECT rk, sum(c) OVER (ORDER BY rk) AS cc FROM top
)
SELECT CAST(k.k AS BIGINT) AS top_k,
       {R("CAST(c.cc AS DOUBLE) / CAST(t.t AS DOUBLE)", 6)} AS coverage
FROM (VALUES (10), (100), (1000)) k(k)
JOIN cum c ON c.rk = k.k
CROSS JOIN tot t
ORDER BY top_k
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(norm_text("text"), " ").alias("toks")
    )
    vocab = docs.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from pyspark.sql import Window as W

    tot = vocab.agg(F.sum("c").cast("long").alias("t"))
    # ordered LIMIT first (TakeOrdered over the vocabulary), THEN the
    # rank window over the bounded 1000-row result
    top = (
        vocab.orderBy(F.desc("c"), F.asc("w"))
        .limit(1000)
        .withColumn("rk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w"))))
    )
    cum = top.select(
        "rk", F.sum("c").over(W.orderBy("rk").rowsBetween(W.unboundedPreceding, 0)).alias("cc")
    )
    ks = spark.createDataFrame([(10,), (100,), (1000,)], "top_k long")
    return (
        ks.join(cum, ks.top_k == cum.rk)
        .crossJoin(F.broadcast(tot))
        .select(
            "top_k",
            pround(F.col("cc").cast("double") / F.col("t").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("top_k")
    )


# ---------------------------------------------------------------------------
# Price-relative outlier fences (the HICP data-cleaning pass): each
# part's month-over-month unit-price relative is screened against its
# month's Tukey fences (Q1/Q3 are percentile_disc picks of identical
# ratio doubles — bit-exact; fence arithmetic on identical doubles).
# Month-to-month matching is the linear (part, month-1) equi-join.
# ---------------------------------------------------------------------------


@query(
    "statcan_price_relative_fences",
    oracle=f"""
WITH pm AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS ord,
         strftime(l_shipdate, '%Y-%m') AS month, l_partkey,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS extc,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2, l_partkey
), up AS (
  SELECT ord, month, l_partkey,
         CAST(floor(CAST(extc AS DOUBLE) / qty + 0.5) AS BIGINT) AS upc
  FROM pm WHERE qty > 0
), rel AS (
  SELECT c.ord, c.month,
         CAST(c.upc AS DOUBLE) / CAST(p.upc AS DOUBLE) AS r
  FROM up c JOIN up p ON c.l_partkey = p.l_partkey AND p.ord = c.ord - 1
), fences AS (
  SELECT ord, month,
         CAST(count(*) AS BIGINT) AS n_items,
         quantile_disc(r, 0.25) AS q1,
         quantile_disc(r, 0.75) AS q3
  FROM rel GROUP BY ord, month
)
SELECT f.month, f.n_items,
       {R("f.q1", 6)} AS q1, {R("f.q3", 6)} AS q3,
       CAST(sum(CASE WHEN r.r < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR r.r > f.q3 + 1.5 * (f.q3 - f.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM rel r JOIN fences f ON r.ord = f.ord
GROUP BY f.month, f.n_items, f.q1, f.q3
ORDER BY f.month
""",
)
def statcan_price_relative_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("ord"),
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        "l_partkey",
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")).alias(
            "extc"
        ),
        F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long")).alias("qty"),
    )
    up = pm.filter(F.col("qty") > 0).select(
        "ord",
        "month",
        "l_partkey",
        F.floor(F.col("extc").cast("double") / F.col("qty") + 0.5)
        .cast("long")
        .alias("upc"),
    )
    prev = up.select(
        F.col("l_partkey").alias("pk"),
        (F.col("ord") + 1).alias("ord_next"),
        F.col("upc").alias("upc_p"),
    )
    rel = up.join(
        prev,
        (F.col("l_partkey") == F.col("pk")) & (F.col("ord") == F.col("ord_next")),
    ).select(
        "ord",
        "month",
        (F.col("upc").cast("double") / F.col("upc_p").cast("double")).alias("r"),
    )
    fences = rel.groupBy("ord", "month").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY r)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY r)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = F.when(
        (F.col("r") < F.col("q1") - F.lit(1.5) * iqr)
        | (F.col("r") > F.col("q3") + F.lit(1.5) * iqr),
        1,
    ).otherwise(0)
    return (
        rel.join(F.broadcast(fences.drop("month")), "ord")
        .groupBy("month", "n_items", "q1", "q3")
        .agg(F.sum(out).cast("long").alias("n_outliers"))
        .select(
            "month",
            "n_items",
            pround(F.col("q1"), 6).alias("q1"),
            pround(F.col("q3"), 6).alias("q3"),
            "n_outliers",
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Brand return-rate ranking by Wilson lower bound — the classic
# small-sample-safe ranking (a brand with 2/2 returns must NOT outrank
# one with 90/100). Counts are exact integers; the Wilson score's
# doubles come from identical integer inputs and the fixed z = 1.96
# literal, so ranking order is engine-exact (ordered output with a
# brand tie-break).
# ---------------------------------------------------------------------------


@query(
    "brand_return_rate_wilson",
    oracle=f"""
WITH b AS (
  SELECT p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returns
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT brand, n_items, n_returns,
       {R("CAST(n_returns AS DOUBLE) / CAST(n_items AS DOUBLE)", 6)} AS return_rate,
       {R("(CAST(n_returns AS DOUBLE) / CAST(n_items AS DOUBLE)"
          " + 1.96 * 1.96 / (2.0 * CAST(n_items AS DOUBLE))"
          " - 1.96 * sqrt((CAST(n_returns AS DOUBLE) / CAST(n_items AS DOUBLE))"
          "   * (1.0 - CAST(n_returns AS DOUBLE) / CAST(n_items AS DOUBLE))"
          "   / CAST(n_items AS DOUBLE)"
          "   + 1.96 * 1.96 / (4.0 * CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE))))"
          " / (1.0 + 1.96 * 1.96 / CAST(n_items AS DOUBLE))", 6)} AS wilson_lb
FROM b
ORDER BY brand
""",
)
def brand_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returns"),
        )
    )
    n = F.col("n_items").cast("double")
    p = F.col("n_returns").cast("double") / n
    z2 = F.lit(1.96) * F.lit(1.96)
    wilson = (
        p
        + z2 / (F.lit(2.0) * n)
        - F.lit(1.96)
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
    ) / (F.lit(1.0) + z2 / n)
    return b.select(
        "brand",
        "n_items",
        "n_returns",
        pround(p, 6).alias("return_rate"),
        pround(wilson, 6).alias("wilson_lb"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# Horvitz–Thompson total estimation audit: the deterministic md5 ~30%
# customer sample (the raking frame) estimates total order revenue by
# inverse-probability weighting; the audit reports the estimate, its
# SRS variance estimate N²(1−f)s²/n, and the TRUE total (held out —
# exact cents), per market segment. All moments exact integers; the
# design constants f = n/N enter as exact integer ratios.
# ---------------------------------------------------------------------------


@query(
    "survey_ht_total_audit",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment AS segment,
         substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '4d' AS in_sample
  FROM customer
), rev AS (
  SELECT c.segment, c.in_sample,
         CAST(sum({sql_cents("o.o_totalprice")}) AS BIGINT) AS rev_c
  FROM cust c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.segment, c.in_sample
), frame AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n_frame,
         CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
         CAST(sum(rev_c) AS HUGEINT) AS true_c,
         CAST(sum(CASE WHEN in_sample THEN rev_c ELSE 0 END) AS HUGEINT) AS samp_c,
         CAST(sum(CASE WHEN in_sample THEN CAST(rev_c AS HUGEINT) * rev_c
                       ELSE 0 END) AS HUGEINT) AS samp_c2
  FROM rev GROUP BY segment
)
SELECT segment, n_frame, n_sample,
       {R("CAST(true_c AS DOUBLE) / 100.0", 2)} AS true_total,
       {R("CAST(n_frame AS DOUBLE) / CAST(n_sample AS DOUBLE)"
          " * CAST(samp_c AS DOUBLE) / 100.0", 2)} AS ht_estimate,
       {R("(CAST(n_frame AS DOUBLE) / CAST(n_sample AS DOUBLE)"
          " * CAST(samp_c AS DOUBLE) - CAST(true_c AS DOUBLE))"
          " / CAST(true_c AS DOUBLE)", 6)} AS rel_error,
       {R("CAST(n_frame AS DOUBLE) * CAST(n_frame AS DOUBLE)"
          " * (1.0 - CAST(n_sample AS DOUBLE) / CAST(n_frame AS DOUBLE))"
          " * ((CAST(n_sample AS DOUBLE) * CAST(samp_c2 AS DOUBLE)"
          "     - CAST(samp_c AS DOUBLE) * CAST(samp_c AS DOUBLE))"
          "    / (CAST(n_sample AS DOUBLE) * (CAST(n_sample AS DOUBLE) - 1.0)))"
          " / CAST(n_sample AS DOUBLE) / 10000.0 / 1000000.0", 4)} AS var_est_millions
FROM frame
ORDER BY segment
""",
)
def survey_ht_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import cents

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        (
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2) < "4d"
        ).alias("in_sample"),
    )
    orders = load_table(spark, sf_dir, "orders")
    # Shuffle join on purpose: orders AND customer are both fact-scale at
    # 100 TB, so neither side may be broadcast (Spark's 8 GB broadcast
    # hard limit would kill the query). tests/test_plans.py pins that no
    # broadcast hint reaches this join.
    rev = (
        orders.select("o_custkey", "o_totalprice")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "segment", "in_sample")
        .agg(F.sum(cents("o_totalprice")).cast("long").alias("rev_c"))
    )
    dec = "decimal(38,0)"
    frame = rev.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_frame"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).cast("long").alias("n_sample"),
        F.sum(F.col("rev_c").cast(dec)).alias("true_c"),
        F.sum(F.when(F.col("in_sample"), F.col("rev_c")).otherwise(0).cast(dec)).alias(
            "samp_c"
        ),
        F.sum(
            F.when(
                F.col("in_sample"), F.col("rev_c").cast(dec) * F.col("rev_c").cast(dec)
            ).otherwise(F.lit(0).cast(dec))
        ).alias("samp_c2"),
    )
    nf = F.col("n_frame").cast("double")
    ns = F.col("n_sample").cast("double")
    sc = F.col("samp_c").cast("double")
    sc2 = F.col("samp_c2").cast("double")
    tc = F.col("true_c").cast("double")
    ht = nf / ns * sc
    s2 = (ns * sc2 - sc * sc) / (ns * (ns - F.lit(1.0)))
    return frame.select(
        "segment",
        "n_frame",
        "n_sample",
        pround(tc / F.lit(100.0), 2).alias("true_total"),
        pround(ht / F.lit(100.0), 2).alias("ht_estimate"),
        pround((ht - tc) / tc, 6).alias("rel_error"),
        pround(
            nf * nf * (F.lit(1.0) - ns / nf) * s2 / ns / F.lit(10000.0) / F.lit(1e6),
            4,
        ).alias("var_est_millions"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Fiscal-year (April–March) summary — the StatCan reporting calendar:
# orders rolled up to FY with exact cents, plus FY-over-FY growth via
# a lag over the bounded fiscal-year series. Integer month arithmetic
# derives the FY label identically in both engines.
# ---------------------------------------------------------------------------


@query(
    "orders_fiscal_year_summary",
    oracle=f"""
WITH fy AS (
  SELECT CAST(year(o_orderdate)
              + CASE WHEN month(o_orderdate) >= 4 THEN 0 ELSE -1 END AS BIGINT)
           AS fy_start,
         {sql_cents("o_totalprice")} AS vc
  FROM orders
), agg AS (
  SELECT fy_start,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(vc) AS BIGINT) AS rev_c
  FROM fy GROUP BY fy_start
)
SELECT 'FY' || CAST(fy_start AS VARCHAR) || '/'
         || substr(CAST(fy_start + 1 AS VARCHAR), 3, 2) AS fiscal_year,
       n_orders,
       {R("CAST(rev_c AS DOUBLE) / 100.0", 2)} AS revenue,
       {R("(CAST(rev_c AS DOUBLE)"
          " - CAST(lag(rev_c) OVER (ORDER BY fy_start) AS DOUBLE))"
          " / CAST(lag(rev_c) OVER (ORDER BY fy_start) AS DOUBLE)", 6)} AS yoy_growth
FROM agg
ORDER BY fiscal_year
""",
)
def orders_fiscal_year_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.portable import cents

    orders = load_table(spark, sf_dir, "orders")
    fy = orders.select(
        (
            F.year("o_orderdate")
            + F.when(F.month("o_orderdate") >= 4, 0).otherwise(-1)
        )
        .cast("long")
        .alias("fy_start"),
        cents("o_totalprice").alias("vc"),
    )
    agg = fy.groupBy("fy_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("vc").cast("long").alias("rev_c"),
    )
    wfy = W.orderBy("fy_start")
    prev = F.lag("rev_c").over(wfy).cast("double")
    return agg.select(
        F.concat(
            F.lit("FY"),
            F.col("fy_start").cast("string"),
            F.lit("/"),
            F.substring((F.col("fy_start") + 1).cast("string"), 3, 2),
        ).alias("fiscal_year"),
        "n_orders",
        pround(F.col("rev_c").cast("double") / F.lit(100.0), 2).alias("revenue"),
        pround((F.col("rev_c").cast("double") - prev) / prev, 6).alias("yoy_growth"),
    ).orderBy("fiscal_year")


# ---------------------------------------------------------------------------
# Industry concentration ratios CR4/CR8 per nation (companion to the
# Herfindahl query): share of each nation's supply revenue held by its
# top 4 / top 8 suppliers. The rank window partitions by nation
# (bounded per-partition work — suppliers per nation); shares are
# exact integer cents ratios.
# ---------------------------------------------------------------------------


@query(
    "supplier_concentration_cr4",
    oracle=f"""
WITH sup AS (
  SELECT n.n_name AS nation, l.l_suppkey,
         CAST(sum({sql_cents("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
           AS rev_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_suppkey
), ranked AS (
  SELECT nation, rev_c,
         row_number() OVER (PARTITION BY nation ORDER BY rev_c DESC, l_suppkey) AS rk
  FROM sup
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       {R("CAST(sum(rev_c) AS DOUBLE) / 100.0", 2)} AS total_rev,
       {R("CAST(sum(CASE WHEN rk <= 4 THEN rev_c ELSE 0 END) AS DOUBLE)"
          " / CAST(sum(rev_c) AS DOUBLE)", 6)} AS cr4,
       {R("CAST(sum(CASE WHEN rk <= 8 THEN rev_c ELSE 0 END) AS DOUBLE)"
          " / CAST(sum(rev_c) AS DOUBLE)", 6)} AS cr8
FROM ranked
GROUP BY nation
ORDER BY nation
""",
)
def supplier_concentration_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.portable import cents

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(cents(F.expr("l_extendedprice * (1 - l_discount)")))
            .cast("long")
            .alias("rev_c")
        )
    )
    wrk = W.partitionBy("nation").orderBy(F.desc("rev_c"), F.asc("l_suppkey"))
    ranked = cells.withColumn("rk", F.row_number().over(wrk))
    top = lambda k: F.sum(  # noqa: E731
        F.when(F.col("rk") <= k, F.col("rev_c")).otherwise(0)
    ).cast("double")
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("rev_c").cast("long").alias("tot"),
            pround(top(4) / F.sum("rev_c").cast("double"), 6).alias("cr4"),
            pround(top(8) / F.sum("rev_c").cast("double"), 6).alias("cr8"),
        )
        .select(
            "nation",
            "n_suppliers",
            pround(F.col("tot").cast("double") / F.lit(100.0), 2).alias("total_rev"),
            "cr4",
            "cr8",
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Event-value quartile bands per event type (the under-used `value`
# column): discrete quartiles (actual stored doubles — bit-exact),
# then an exact census of which band each event falls in. One
# aggregate for the bounded quartile table (broadcast back), one
# linear pass for the census.
# ---------------------------------------------------------------------------


@query(
    "events_value_quartile_bands",
    oracle=f"""
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.50) AS q2,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {R("q.q1", 4)} AS q1, {R("q.q2", 4)} AS q2, {R("q.q3", 4)} AS q3,
       CAST(sum(CASE WHEN e.value <= q.q1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b1,
       CAST(sum(CASE WHEN e.value > q.q1 AND e.value <= q.q2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_b2,
       CAST(sum(CASE WHEN e.value > q.q2 AND e.value <= q.q3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_b3,
       CAST(sum(CASE WHEN e.value > q.q3 THEN 1 ELSE 0 END) AS BIGINT) AS n_b4
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type, q.q1, q.q2, q.q3
ORDER BY e.event_type
""",
)
def events_value_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    v = F.col("value")
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "q1", "q2", "q3")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(v <= F.col("q1"), 1).otherwise(0)).cast("long").alias("n_b1"),
            F.sum(F.when((v > F.col("q1")) & (v <= F.col("q2")), 1).otherwise(0))
            .cast("long")
            .alias("n_b2"),
            F.sum(F.when((v > F.col("q2")) & (v <= F.col("q3")), 1).otherwise(0))
            .cast("long")
            .alias("n_b3"),
            F.sum(F.when(v > F.col("q3"), 1).otherwise(0)).cast("long").alias("n_b4"),
        )
        .select(
            "event_type",
            "n_events",
            pround(F.col("q1"), 4).alias("q1"),
            pround(F.col("q2"), 4).alias("q2"),
            pround(F.col("q3"), 4).alias("q3"),
            "n_b1",
            "n_b2",
            "n_b3",
            "n_b4",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Effective tax-rate audit (the under-used l_tax column): per return
# flag / line status, exact-cents tax collected vs the discounted
# base, plus the min/max stored tax rate — a reconciliation check a
# revenue pipeline runs before publishing. Per-row tax amounts are
# rounded to cents ONCE (portable floor+0.5) then summed exactly.
# ---------------------------------------------------------------------------


@query(
    "lineitem_tax_audit",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       {R("CAST(sum(" + sql_cents("l_extendedprice * (1 - l_discount)") + ") AS DOUBLE) / 100.0", 2)}
         AS base_revenue,
       {R("CAST(sum(" + sql_cents("l_extendedprice * (1 - l_discount) * l_tax") + ") AS DOUBLE) / 100.0", 2)}
         AS tax_collected,
       {R("CAST(sum(" + sql_cents("l_extendedprice * (1 - l_discount) * l_tax") + ") AS DOUBLE)"
          " / CAST(sum(" + sql_cents("l_extendedprice * (1 - l_discount)") + ") AS DOUBLE)", 6)}
         AS effective_rate,
       {R("min(l_tax)", 2)} AS min_rate,
       {R("max(l_tax)", 2)} AS max_rate
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def lineitem_tax_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import cents

    li = load_table(spark, sf_dir, "lineitem")
    base = cents(F.expr("l_extendedprice * (1 - l_discount)"))
    tax = cents(F.expr("l_extendedprice * (1 - l_discount) * l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(base).cast("long").alias("base_c"),
            F.sum(tax).cast("long").alias("tax_c"),
            F.min("l_tax").alias("mnr"),
            F.max("l_tax").alias("mxr"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_items",
            pround(F.col("base_c").cast("double") / F.lit(100.0), 2).alias(
                "base_revenue"
            ),
            pround(F.col("tax_c").cast("double") / F.lit(100.0), 2).alias(
                "tax_collected"
            ),
            pround(
                F.col("tax_c").cast("double") / F.col("base_c").cast("double"), 6
            ).alias("effective_rate"),
            pround(F.col("mnr"), 2).alias("min_rate"),
            pround(F.col("mxr"), 2).alias("max_rate"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# QQ comparison of ship latency between URGENT and LOW priorities:
# matched discrete deciles (actual integer day values — bit-exact)
# side by side, the distribution-shift diagnostic that goes with the
# KS test. Two bounded decile aggregates joined on the decile index.
# ---------------------------------------------------------------------------


@query(
    "orders_latency_qq_by_priority",
    oracle=f"""
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS days
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
), qwide AS (
  SELECT priority,
         quantile_disc(days, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs,
         CAST(count(*) AS BIGINT) AS n
  FROM lat GROUP BY priority
), q AS (
  SELECT priority, CAST(i AS INTEGER) AS decile,
         CAST(qs[i] AS BIGINT) AS days_q, n
  FROM qwide, unnest(range(1, 10)) t(i)
)
SELECT a.decile,
       a.days_q AS urgent_days, b.days_q AS low_days,
       CAST(b.days_q - a.days_q AS BIGINT) AS gap_days,
       a.n AS n_urgent, b.n AS n_low
FROM q a JOIN q b ON a.decile = b.decile
WHERE a.priority = '1-URGENT' AND b.priority = '5-LOW'
ORDER BY a.decile
""",
)
def orders_latency_qq_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            )
            .cast("long")
            .alias("days"),
        )
    )
    # Spark's percentile_disc needs a LITERAL fraction — nine aggregate
    # columns, stacked back to (decile, days_q) rows
    aggs = [
        F.expr(f"percentile_disc({d / 10.0}) WITHIN GROUP (ORDER BY days)")
        .cast("long")
        .alias(f"q{d}")
        for d in range(1, 10)
    ]
    wide = lat.groupBy("priority").agg(
        *aggs, F.count(F.lit(1)).cast("long").alias("n")
    )
    stack = ", ".join(f"{d}, q{d}" for d in range(1, 10))
    q = wide.selectExpr(
        "priority", "n", f"stack(9, {stack}) AS (decile, days_q)"
    ).select("priority", F.col("decile").cast("int").alias("decile"), "days_q", "n")
    a = q.filter(F.col("priority") == "1-URGENT").select(
        "decile", F.col("days_q").alias("urgent_days"), F.col("n").alias("n_urgent")
    )
    b = q.filter(F.col("priority") == "5-LOW").select(
        F.col("decile").alias("d2"),
        F.col("days_q").alias("low_days"),
        F.col("n").alias("n_low"),
    )
    return (
        a.join(b, a.decile == b.d2)
        .select(
            "decile",
            "urgent_days",
            "low_days",
            (F.col("low_days") - F.col("urgent_days")).cast("long").alias("gap_days"),
            "n_urgent",
            "n_low",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# p-chart (attribute control chart) on the daily error-event
# proportion: 3σ limits around the pooled p̄, per-day n-adjusted
# (UCL/LCL = p̄ ± 3·sqrt(p̄(1−p̄)/n)) — classic SPC over the bounded
# daily aggregate, with the pooled rates exact integer ratios and the
# flag a comparison of identical doubles.
# ---------------------------------------------------------------------------


@query(
    "events_error_pchart",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS errs
  FROM events GROUP BY 1
), pooled AS (
  SELECT CAST(sum(errs) AS BIGINT) AS tot_e, CAST(sum(n) AS BIGINT) AS tot_n
  FROM daily
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n, d.errs,
       {R("CAST(d.errs AS DOUBLE) / CAST(d.n AS DOUBLE)", 6)} AS p,
       {R("CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)"
          " + 3.0 * sqrt(CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)"
          " * (1.0 - CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE))"
          " / CAST(d.n AS DOUBLE))", 6)} AS ucl,
       {R("CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)"
          " - 3.0 * sqrt(CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)"
          " * (1.0 - CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE))"
          " / CAST(d.n AS DOUBLE))", 6)} AS lcl,
       CAST(CASE WHEN CAST(d.errs AS DOUBLE) / CAST(d.n AS DOUBLE)
                      > CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)
                        + 3.0 * sqrt(CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)
                          * (1.0 - CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE))
                          / CAST(d.n AS DOUBLE))
                   OR CAST(d.errs AS DOUBLE) / CAST(d.n AS DOUBLE)
                      < CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)
                        - 3.0 * sqrt(CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE)
                          * (1.0 - CAST(p0.tot_e AS DOUBLE) / CAST(p0.tot_n AS DOUBLE))
                          / CAST(d.n AS DOUBLE))
                 THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM daily d CROSS JOIN pooled p0
ORDER BY day
""",
)
def events_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    pooled = daily.agg(
        F.sum("errs").cast("long").alias("tot_e"),
        F.sum("n").cast("long").alias("tot_n"),
    )
    p = F.col("errs").cast("double") / F.col("n").cast("double")
    pbar = F.col("tot_e").cast("double") / F.col("tot_n").cast("double")
    half = F.lit(3.0) * F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n").cast("double"))
    ucl = pbar + half
    lcl = pbar - half
    return (
        daily.crossJoin(F.broadcast(pooled))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "errs",
            pround(p, 6).alias("p"),
            pround(ucl, 6).alias("ucl"),
            pround(lcl, 6).alias("lcl"),
            F.when((p > ucl) | (p < lcl), 1).otherwise(0).cast("long").alias(
                "out_of_control"
            ),
        )
        .orderBy("day")
    )
