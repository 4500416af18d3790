"""Ordered statistics and closed-form modeling (round 5, fourth wave):
exact weighted median through the bucketed two-pass prefix-sum pattern,
and grouped OLS regression from exact moment sums.

House rules as everywhere else (see curation.py): JVM-side expressions
only, rational arithmetic, exact int64/decimal fixed-point sums before
any division, portable rounding, mirrored DuckDB oracle per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Exact weighted median of part price, weighted by units sold, per
# brand — the robust price-point statistic no built-in aggregate
# provides (percentile_disc is unweighted). The half-weight crossing
# needs a cumulative weight in price order; instead of one window per
# brand over all its parts, the house two-pass pattern bounds every
# window: per-(brand, price-range-bucket) cumulative sums plus an
# exclusive cross-bucket prefix over each brand's 256-row bucket
# summary. All weights are integer units, so the crossing test
# (2·cum ≥ total) is exact. Parts with no sales don't participate
# (weight 0 cannot move a weighted median).
# ---------------------------------------------------------------------------


@query(
    "weighted_median_price_by_brand",
    oracle=f"""
WITH sold AS (
  SELECT l_partkey, CAST(sum({sql_cents("l_quantity", 0)}) AS BIGINT) AS w
  FROM lineitem GROUP BY l_partkey
), priced AS (
  SELECT p.p_brand, p.p_partkey, {sql_cents("p.p_retailprice")} AS price_c, s.w
  FROM sold s JOIN part p ON s.l_partkey = p.p_partkey
), cum AS (
  SELECT p_brand, price_c, w,
         CAST(sum(w) OVER (PARTITION BY p_brand ORDER BY price_c, p_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
         CAST(sum(w) OVER (PARTITION BY p_brand) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_parts
  FROM priced
)
SELECT p_brand, n_parts, tot AS total_units,
       {R("(CAST(min(price_c) FILTER (WHERE 2 * cw >= tot) AS DOUBLE) / 100.0)", 2)}
         AS wmedian_price
FROM cum
GROUP BY p_brand, n_parts, tot
ORDER BY p_brand
""",
)
def weighted_median_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    sold = li.groupBy("l_partkey").agg(
        F.sum(cents("l_quantity", 0)).cast("long").alias("w")
    )
    priced = sold.join(part, sold.l_partkey == part.p_partkey).select(
        "p_brand",
        "p_partkey",
        cents("p_retailprice").cast("long").alias("price_c"),
        "w",
    )
    # per-brand 256 ordered price-range buckets (bucket id monotone in
    # price), from each brand's max price — a tiny broadcast aggregate
    bmax = priced.groupBy("p_brand").agg(F.max("price_c").alias("mx"))
    bucketed = priced.join(F.broadcast(bmax), "p_brand").select(
        "p_brand",
        "p_partkey",
        "price_c",
        "w",
        (F.col("price_c") * 256 / (F.col("mx") + 1)).cast("long").alias("bucket"),
    )
    # cross-bucket exclusive prefix weight + brand totals/counts (the
    # bucket summary is ≤256 rows per brand)
    bsum = bucketed.groupBy("p_brand", "bucket").agg(
        F.sum("w").cast("long").alias("bw"),
        F.count(F.lit(1)).cast("long").alias("bn"),
    )
    woff = W.partitionBy("p_brand").orderBy("bucket").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = bsum.select(
        "p_brand",
        "bucket",
        F.coalesce(F.sum("bw").over(woff), F.lit(0)).cast("long").alias("off"),
        F.sum("bw").over(W.partitionBy("p_brand")).cast("long").alias("tot"),
        F.sum("bn").over(W.partitionBy("p_brand")).cast("long").alias("n_parts"),
    )
    wcum = W.partitionBy("p_brand", "bucket").orderBy("price_c", "p_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = bucketed.join(F.broadcast(offsets), ["p_brand", "bucket"]).select(
        "p_brand",
        "price_c",
        "n_parts",
        "tot",
        (F.col("off") + F.sum("w").over(wcum)).cast("long").alias("cw"),
    )
    return (
        cum.groupBy("p_brand", "n_parts", F.col("tot").alias("total_units"))
        .agg(
            pround(
                F.min(
                    F.when(2 * F.col("cw") >= F.col("tot"), F.col("price_c"))
                ).cast("double")
                / F.lit(100.0),
                2,
            ).alias("wmedian_price")
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Grouped OLS regression: units sold vs retail price per part type —
# the closed-form elasticity screen. Per-part (x, y) points reduce to
# five exact moment sums per group (Σx, Σy, Σxy, Σx², n — accumulated
# in DECIMAL(38,0)/HUGEINT, order-independent), then one double
# division each for slope and intercept. Two map-combinable shuffles
# total; groups never pass through a window.
# ---------------------------------------------------------------------------


@query(
    "price_qty_regression_by_type",
    oracle=f"""
WITH pts AS (
  SELECT p.p_type,
         CAST({sql_cents("p.p_retailprice")} AS HUGEINT) AS x,
         CAST(sum({sql_cents("l.l_quantity", 0)}) AS HUGEINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_type, p.p_partkey, p.p_retailprice
), moments AS (
  SELECT p_type,
         CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM pts GROUP BY p_type
)
SELECT p_type, n_parts,
       -- degenerate-x guard: when every part in the type shares one
       -- retail price the denominator is exactly 0; Spark (non-ANSI)
       -- yields NULL on /0 while recent DuckDB defaults yield Inf/NaN,
       -- so both engines must short-circuit to NULL explicitly
       CASE WHEN (CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0 THEN NULL ELSE
       {R("((CAST(n_parts AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
          " / (CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))", 8)}
         END AS slope,
       CASE WHEN (CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0 THEN NULL ELSE
       {R("((CAST(sy AS DOUBLE) - ((CAST(n_parts AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
          " / (CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))"
          " / CAST(n_parts AS DOUBLE))", 4)}
         END AS intercept
FROM moments
WHERE n_parts >= 2
ORDER BY p_type
""",
)
def price_qty_regression_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type", "p_retailprice")
    dec = "decimal(38,0)"
    pts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_partkey", "p_retailprice")
        .agg(F.sum(cents("l_quantity", 0)).cast(dec).alias("y"))
        .select("p_type", cents("p_retailprice").cast(dec).alias("x"), "y")
    )
    moments = pts.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_parts").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / det
    # mirror the oracle's degenerate-x guard: NULL when det is exactly 0
    return (
        moments.filter(F.col("n_parts") >= 2)
        .select(
            "p_type",
            "n_parts",
            F.when(det != 0, pround(slope, 8)).alias("slope"),
            F.when(det != 0, pround((sy - slope * sx) / n, 4)).alias("intercept"),
        )
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# Range-banding join: classify each order's total into a banded
# dimension defined by [lo, hi) intervals — the static-range-lookup
# shape (IP→geo, tariff bands, credit tiers). The band table is O(1)
# rows, so the non-equi join broadcasts (a BroadcastNestedLoopJoin over
# a 5-row build side is a constant-factor map op, NOT a scale hazard —
# contrast with the banned fact×fact nested loop). Band bounds are
# integer cents; each order lands in exactly one band by construction.
# ---------------------------------------------------------------------------

_BANDS = [
    ("B1_budget", 0, 5_000_00),
    ("B2_standard", 5_000_00, 15_000_00),
    ("B3_premium", 15_000_00, 30_000_00),
    ("B4_luxury", 30_000_00, 60_000_00),
    ("B5_flagship", 60_000_00, 10**15),
]

_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)


@query(
    "orders_price_bands",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL}),
tot AS (
  SELECT o_orderkey, o_orderpriority, {sql_cents("o_totalprice")} AS total_c
  FROM orders
)
SELECT b.band, t.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       {R("(CAST(sum(t.total_c) AS DOUBLE) / 100.0)", 2)} AS revenue
FROM tot t JOIN bands b ON t.total_c >= b.lo AND t.total_c < b.hi
GROUP BY b.band, t.o_orderpriority
ORDER BY b.band, t.o_orderpriority
""",
)
def orders_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", cents("o_totalprice").cast("long").alias("total_c")
    )
    bands = F.broadcast(
        orders.sparkSession.createDataFrame(_BANDS, "band string, lo long, hi long")
    )
    return (
        orders.join(
            bands, (F.col("total_c") >= F.col("lo")) & (F.col("total_c") < F.col("hi"))
        )
        .groupBy("band", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pround(F.sum("total_c").cast("double") / F.lit(100.0), 2).alias("revenue"),
        )
        .orderBy("band", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Fulfillment SLA bands: lineitems shipped within 30 / 60 / 90 days of
# the order, per order priority — integer day arithmetic, exact band
# counts, shares rounded once. One fact-side join (orderdate attach)
# and one map-combinable aggregation.
# ---------------------------------------------------------------------------


@query(
    "orders_sla_fulfillment",
    oracle=f"""
WITH lag AS (
  SELECT o.o_orderpriority,
         CAST(floor(epoch(l.l_shipdate) / 86400.0)
              - floor(epoch(o.o_orderdate) / 86400.0) AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS within_30,
       CAST(sum(CASE WHEN days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS within_60,
       CAST(sum(CASE WHEN days <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS within_90,
       {R("(CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE))", 6)}
         AS sla30_rate
FROM lag
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_sla_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    day = lambda c: F.floor(F.unix_timestamp(F.col(c)) / F.lit(86400.0)).cast("long")
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", (day("l_shipdate") - day("o_orderdate")).alias("days")
    )
    in30 = F.sum(F.when(F.col("days") <= 30, 1).otherwise(0)).cast("long")
    return (
        lag.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            in30.alias("within_30"),
            F.sum(F.when(F.col("days") <= 60, 1).otherwise(0)).cast("long").alias("within_60"),
            F.sum(F.when(F.col("days") <= 90, 1).otherwise(0)).cast("long").alias("within_90"),
            pround(in30.cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "sla30_rate"
            ),
        )
        .orderBy("o_orderpriority")
    )
