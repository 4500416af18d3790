"""Relational coverage, batch 3 (round 2): the last TPC-H shape (Q21),
a Q11-style fraction-of-global HAVING, a portable Pearson correlation,
and deterministic hash-bucket sampling.

Parity notes (see functions/portable.py):
- Q21 "late" is a timestamp + INTERVAL comparison — exact on both
  engines (no float involved).
- Q11 compares integer cent sums cross-multiplied by the fraction
  denominator, so the HAVING is exact integer arithmetic on both sides.
- Correlation moments are integer fixed-point sums (variance pattern,
  relational2.variance_order_value); the final double expression is
  computed from identical integers on both engines, so IEEE ops make it
  bit-identical. Σp² is stored in units²/100 to keep per-group sums
  below 2^63 through sf≈1000 (6e9 rows × 1.1e8 ≈ 6.6e17).
- Sampling uses md5 hex-prefix bucketing (substr(md5(key),1,1) = '0',
  a deterministic 1/16 sample) — the same md5-as-string trick the
  minhash operator uses, so no hex→int conversion is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import (
    money_sum,
    pround,
    sql_money_sum as MS,
    sql_round as R,
)
from ..registry import query

REV_SQL = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q21-shaped: suppliers who were the sole late shipper of a
# multi-supplier order. The testdata has no commit/receipt dates, so
# "late" is l_shipdate > o_orderdate + 60 days. Two-level aggregation:
# per-order distinct-supplier / distinct-late-supplier counts, then the
# late lineitem rows of qualifying orders rolled up per supplier.
# ---------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
WITH ol AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM ol GROUP BY l_orderkey
), sole_late AS (
  SELECT DISTINCT ol.l_orderkey, ol.l_suppkey
  FROM ol JOIN per_order USING (l_orderkey)
  WHERE ol.late AND per_order.n_supp > 1 AND per_order.n_late = 1
)
SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
FROM sole_late
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    ol = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per_order = ol.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    sole_late = (
        ol.filter("late")
        .join(
            per_order.filter("n_supp > 1 AND n_late = 1").select("l_orderkey"),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q11-shaped: "important stock" — (nation, part) groups whose revenue
# exceeds 1/20000 of the GLOBAL total (the testdata has no partsupp, so
# lineitem revenue through the supplier's nation stands in for stock
# value). The HAVING cross-multiplies integer cent sums — exact.
# ---------------------------------------------------------------------------
_Q11_FRAC = 20000

@query(
    "q11_important_stock",
    oracle=f"""
WITH v AS (
  SELECT n_name, l_partkey,
         CAST(sum(CAST(floor(({REV_SQL}) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS val_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
), g AS (SELECT CAST(sum(val_c) AS BIGINT) AS tot FROM v)
SELECT n_name, l_partkey, (CAST(val_c AS BIGINT) / 100.0) AS stock_value
FROM v, g
WHERE val_c * {_Q11_FRAC} > tot
ORDER BY stock_value DESC, n_name, l_partkey
LIMIT 100
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(
            F.sum(F.floor(rev * F.lit(100.0) + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("val_c")
        )
    )
    # scalar global total — one row, broadcast into the filter
    g = v.agg(F.sum("val_c").cast("long").alias("tot"))
    return (
        v.crossJoin(F.broadcast(g))
        .filter(F.col("val_c") * F.lit(_Q11_FRAC) > F.col("tot"))
        .select(
            "n_name",
            "l_partkey",
            (F.col("val_c") / F.lit(100.0)).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "n_name", "l_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Portable Pearson correlation (quantity vs extended price per
# returnflag) from exact integer moment sums. corr()/covar_samp()
# accumulate doubles in engine-specific order, so they are NOT
# hash-stable across engines; this is.
# Scales: Σq in centi-units, Σq² in units²·100, Σp in cents,
# Σp² in units²/100 (headroom to sf≈1000), Σpq in units.
# ---------------------------------------------------------------------------
@query(
    "corr_price_quantity",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
         CAST(sum(CAST(floor(l_quantity * l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sqq,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sp,
         CAST(sum(CAST(floor(l_extendedprice * l_extendedprice / 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS spp,
         CAST(sum(CAST(floor(l_extendedprice * l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS spq
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       {R("((CAST(n AS DOUBLE) * CAST(spq AS DOUBLE) - (CAST(sp AS DOUBLE) / 100.0) * (CAST(sq AS DOUBLE) / 100.0)) / sqrt((CAST(n AS DOUBLE) * (CAST(sqq AS DOUBLE) / 100.0) - (CAST(sq AS DOUBLE) / 100.0) * (CAST(sq AS DOUBLE) / 100.0)) * (CAST(n AS DOUBLE) * (CAST(spp AS DOUBLE) * 100.0) - (CAST(sp AS DOUBLE) / 100.0) * (CAST(sp AS DOUBLE) / 100.0))))", 6)} AS corr_qty_price
FROM m
ORDER BY l_returnflag
""",
)
def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(q * F.lit(100.0) + F.lit(0.5)).cast("long")).cast("long").alias("sq"),
        F.sum(F.floor(q * q * F.lit(100.0) + F.lit(0.5)).cast("long")).cast("long").alias("sqq"),
        F.sum(F.floor(p * F.lit(100.0) + F.lit(0.5)).cast("long")).cast("long").alias("sp"),
        F.sum(F.floor(p * p / F.lit(100.0) + F.lit(0.5)).cast("long")).cast("long").alias("spp"),
        F.sum(F.floor(p * q + F.lit(0.5)).cast("long")).cast("long").alias("spq"),
    )
    nd = F.col("n").cast("double")
    sqd = F.col("sq").cast("double") / F.lit(100.0)
    sqqd = F.col("sqq").cast("double") / F.lit(100.0)
    spd = F.col("sp").cast("double") / F.lit(100.0)
    sppd = F.col("spp").cast("double") * F.lit(100.0)
    spqd = F.col("spq").cast("double")
    r = (nd * spqd - spd * sqd) / F.sqrt(
        (nd * sqqd - sqd * sqd) * (nd * sppd - spd * spd)
    )
    return m.select(
        "l_returnflag", "n", pround(r, 6).alias("corr_qty_price")
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Deterministic hash-bucket sampling: a 1/16 sample of orders selected
# by md5 hex prefix — reproducible across engines AND across cluster
# sizes (unlike TABLESAMPLE / rand(seed), which are partition-count
# dependent). Estimator column scales the sampled sum back up.
# ---------------------------------------------------------------------------
@query(
    "sample_hash_bucket",
    oracle=f"""
WITH s AS (
  SELECT * FROM orders
  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_sampled,
       {MS("o_totalprice")} AS sampled_value,
       {R(f"({MS('o_totalprice')} * 16.0)")} AS est_total_value
FROM s
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    s = orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    )
    return (
        s.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            money_sum("o_totalprice").alias("sampled_value"),
            pround(money_sum("o_totalprice") * F.lit(16.0)).alias("est_total_value"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist produce exact
# rationals (k/n — IEEE-division-portable), ranked within each segment.
# ---------------------------------------------------------------------------
@query(
    "window_distribution_functions",
    oracle=f"""
WITH c AS (
  SELECT c_mktsegment, c_custkey, c_acctbal FROM customer WHERE c_custkey <= 200
)
SELECT c_mktsegment, c_custkey,
       {R("percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)", 6)} AS pct_rank,
       {R("cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)", 6)} AS cume,
       first_value(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
       last_value(c_custkey)  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
FROM c
ORDER BY c_mktsegment, c_custkey
""",
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(wfull).alias("poorest"),
        F.last("c_custkey").over(wfull).alias("richest"),
    ).orderBy("c_mktsegment", "c_custkey")


# ---------------------------------------------------------------------------
# Date/interval arithmetic coverage: all-integer or ISO-string outputs
# (no float date math), so cross-engine parity is structural.
# ---------------------------------------------------------------------------
@query(
    "date_arithmetic_demo",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
       CAST(week(o_orderdate) AS BIGINT) AS iso_week
FROM orders
WHERE o_orderkey <= 100
ORDER BY o_orderkey
""",
)
def date_arithmetic_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_epoch_start"),
        # ISO weekday (Mon=1..Sun=7): Spark dayofweek is Sun=1-based
        ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("long").alias("iso_weekday"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Null-handling semantics: coalesce / nullif / null-safe grouping —
# nulls grouped as their own key on both engines, plus null-safe
# equality in a join-ish CASE.
# ---------------------------------------------------------------------------
@query(
    "null_semantics_demo",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null,
         CASE WHEN o_totalprice > 200000 THEN NULL ELSE o_orderstatus END AS status_or_null
  FROM orders
)
SELECT coalesce(prio_or_null, '(defaulted)') AS prio,
       status_or_null,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(status_or_null) AS BIGINT) AS n_nonnull_status
FROM t
GROUP BY prio, status_or_null
ORDER BY prio, status_or_null NULLS FIRST
""",
)
def null_semantics_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    t = orders.select(
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("prio_or_null"),
        F.when(F.col("o_totalprice") > 200000, F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("status_or_null"),
    )
    return (
        t.select(
            F.coalesce("prio_or_null", F.lit("(defaulted)")).alias("prio"),
            "status_or_null",
        )
        .groupBy("prio", "status_or_null")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("status_or_null").cast("long").alias("n_nonnull_status"),
        )
        .orderBy("prio", F.asc_nulls_first("status_or_null"))
    )


# ---------------------------------------------------------------------------
# Safe-cast / safe-division semantics: try_cast returns NULL instead of
# failing the job on dirty input — at pipeline scale one bad row must
# not kill a 100 TB load. Sums stay fixed-point (cents) so the doubles
# divide identically on both engines.
# ---------------------------------------------------------------------------
@query(
    "safe_cast_demo",
    oracle=f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT) AS n_numeric_prio,
       CAST(count(TRY_CAST(o_orderstatus AS INTEGER)) AS BIGINT) AS n_numeric_status,
       {MS("(o_totalprice / nullif(o_custkey % 5, 0))")} AS safe_div_sum
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def safe_cast_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(
                F.substring("o_orderpriority", 1, 1).try_cast("int")
            ).cast("long").alias("n_numeric_prio"),
            F.count(F.col("o_orderstatus").try_cast("int")).cast("long").alias(
                "n_numeric_status"
            ),
            money_sum(
                F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5)
            ).alias("safe_div_sum"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Discrete percentiles: percentile_disc returns an ACTUAL data value
# (no interpolation), so the raw stored double round-trips bit-exactly
# on both engines — no rounding needed at all.
# ---------------------------------------------------------------------------
@query(
    "percentile_disc_order_value",
    oracle="""
SELECT c_mktsegment,
       quantile_disc(o_totalprice, 0.25) AS p25_disc,
       quantile_disc(o_totalprice, 0.50) AS p50_disc,
       quantile_disc(o_totalprice, 0.75) AS p75_disc,
       CAST(count(*) AS BIGINT) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def percentile_disc_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p25_disc"),
            F.expr(
                "percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50_disc"),
            F.expr(
                "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p75_disc"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# FULL OUTER join coverage: per-nation customer counts vs supplier
# counts — nations missing from either side survive with zeros.
# ---------------------------------------------------------------------------
@query(
    "full_outer_nation_coverage",
    oracle="""
WITH c AS (
  SELECT n_name, count(*) AS n_cust
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_acctbal > 9000 GROUP BY n_name
), s AS (
  SELECT n_name, count(*) AS n_supp
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE s_suppkey % 3 = 0 GROUP BY n_name
)
SELECT coalesce(c.n_name, s.n_name) AS n_name,
       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
FROM c FULL OUTER JOIN s ON c.n_name = s.n_name
ORDER BY n_name
""",
)
def full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 3 == 0)
    nation = _t(spark, sf_dir, "nation")
    c = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .alias("c")
    )
    s = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .alias("s")
    )
    return (
        c.join(s, F.col("c.n_name") == F.col("s.n_name"), "full_outer")
        .select(
            F.coalesce(F.col("c.n_name"), F.col("s.n_name")).alias("n_name"),
            F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_supp"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Grid densification: cross-join the full (region × status) dimension
# grid, left-join facts, zero-fill — the standard dense-report pattern
# (missing combinations must APPEAR with 0, not vanish).
# ---------------------------------------------------------------------------
@query(
    "dense_region_status_grid",
    oracle="""
WITH grid AS (
  SELECT r_name, s FROM region
  CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders)
), facts AS (
  SELECT r_name, o_orderstatus AS s, count(*) AS n
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE o_totalprice > 450000
  GROUP BY r_name, s
)
SELECT grid.r_name AS r_name, grid.s AS status,
       CAST(coalesce(n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN facts ON grid.r_name = facts.r_name AND grid.s = facts.s
ORDER BY grid.r_name, status
""",
)
def dense_region_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    statuses = orders.select(F.col("o_orderstatus").alias("s")).distinct()
    grid = region.select("r_name").crossJoin(statuses)
    facts = (
        orders.filter(F.col("o_totalprice") > 450000)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.col("o_orderstatus").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(facts, ["r_name", "s"], "left")
        .select(
            "r_name",
            F.col("s").alias("status"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("r_name", "status")
    )
