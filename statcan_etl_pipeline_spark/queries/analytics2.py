"""Distribution analytics (round 5, second half): Benford first-digit
audit, Gini concentration via the sharded prefix-sum pattern, and a
trailing rolling correlation between two event series.

sqrt is the one non-rational primitive used — IEEE-754 requires it
correctly rounded, so (unlike ln/exp) it is bit-identical across the
JVM and DuckDB. Everything else is exact int64 fixed-point until the
final division.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..registry import query

# ---------------------------------------------------------------------------
# Benford first-digit audit of order totals — a standard forensic DQ
# check. The first significant digit comes from the exact integer-cents
# rendering (no float log10 / division ladder), and the expected
# Benford shares are Python-precomputed literals injected identically
# into both engines, so no transcendental runs at query time.
# ---------------------------------------------------------------------------

_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL = (
    "CASE digit "
    + " ".join(f"WHEN '{d}' THEN {e!r}" for d, e in _BENFORD.items())
    + " END"
)


@query(
    "benford_order_totals",
    oracle=f"""
WITH digits AS (
  SELECT substr(CAST({sql_cents("o_totalprice")} AS VARCHAR), 1, 1) AS digit
  FROM orders WHERE o_totalprice > 0
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM digits)
SELECT digit,
       CAST(count(*) AS BIGINT) AS n,
       {R("(CAST(count(*) AS DOUBLE) / CAST(any_value(tot.n_total) AS DOUBLE))", 6)}
         AS share,
       {R(_BENFORD_SQL, 6)} AS benford_expected,
       {R(f"((CAST(count(*) AS DOUBLE) / CAST(any_value(tot.n_total) AS DOUBLE))"
          f" - ({_BENFORD_SQL}))", 6)} AS deviation
FROM digits CROSS JOIN tot
GROUP BY digit
ORDER BY digit
""",
)
def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1).alias("digit")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    expected = F.when(F.lit(False), F.lit(0.0))
    for d, e in _BENFORD.items():
        expected = expected.when(F.col("digit") == str(d), F.lit(e))
    share = F.count(F.lit(1)).cast("double") / F.any_value("n_total").cast("double")
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pround(share, 6).alias("share"),
            pround(F.any_value(expected), 6).alias("benford_expected"),
            pround(share - F.any_value(expected), 6).alias("deviation"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue concentration. The textbook
# formula needs every customer's rank in revenue order — a global sort.
# Scale path: 256 value-range buckets (ordered by construction), rank
# within bucket via a bucket-partitioned window, bucket-count exclusive
# prefix sum (256-row aggregate) for the global offset — the same
# two-pass distributed prefix sum as doc_greedy_packing_sharded. All
# rank*revenue products accumulate in DECIMAL(38,0) (Spark) / int128
# (DuckDB): exact, overflow-free at warehouse row counts.
# G = (2*S1 - (n+1)*S) / (n*S), S1 = Σ rank_i · rev_i over ascending ranks.
# ---------------------------------------------------------------------------


@query(
    "gini_customer_revenue",
    oracle=f"""
WITH rev AS (
  SELECT o_custkey, CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_c,
         CAST(row_number() OVER (ORDER BY rev_c, o_custkey) AS BIGINT) AS rk
  FROM rev
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rev_c) AS HUGEINT) AS s,
         CAST(sum(CAST(rk AS HUGEINT) * CAST(rev_c AS HUGEINT)) AS HUGEINT) AS s1
  FROM ranked
)
SELECT n AS n_customers,
       {R("(CAST(s AS DOUBLE) / 100.0)", 2)} AS total_rev,
       {R("((2.0 * CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))"
          " / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)))", 6)} AS gini
FROM sums
""",
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast("long").alias("rev_c")
    )
    # 256 ordered value-range buckets from the max (singleton aggregate)
    mx = rev.agg(F.max("rev_c").alias("mx"))
    bucketed = rev.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "rev_c",
        (F.col("rev_c") * 256 / (F.col("mx") + 1)).cast("long").alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    woff = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("bn").over(woff), F.lit(0)).cast("long").alias("off"),
    )
    wrank = W.partitionBy("bucket").orderBy("rev_c", "o_custkey")
    ranked = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "rev_c",
            (F.col("off") + F.row_number().over(wrank)).cast("long").alias("rk"),
        )
    )
    dec = "decimal(38,0)"
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rev_c").cast(dec)).alias("s"),
        F.sum(F.col("rk").cast(dec) * F.col("rev_c").cast(dec)).alias("s1"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    s1_d = F.col("s1").cast("double")
    return sums.select(
        F.col("n").alias("n_customers"),
        pround(s_d / F.lit(100.0), 2).alias("total_rev"),
        pround((F.lit(2.0) * s1_d - (n_d + F.lit(1.0)) * s_d) / (n_d * s_d), 6).alias(
            "gini"
        ),
    )


# ---------------------------------------------------------------------------
# Trailing 7-day rolling Pearson correlation between the daily counts
# of two event types (purchase vs view) — the co-movement monitor of a
# metrics pipeline. The window runs over the POST-AGGREGATE daily
# series (calendar-bounded, ~hundreds of rows at any SF — same
# precedent as window_running_revenue), with exact integer moment sums
# inside the frame; RANGE over a day ordinal so calendar gaps still
# bound the frame to 7 real days.
# ---------------------------------------------------------------------------


@query(
    "events_moving_corr_7d",
    oracle=f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day_no,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS p,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), win AS (
  SELECT day, day_no, p, v,
         CAST(count(*) OVER w AS BIGINT) AS k,
         CAST(sum(p) OVER w AS BIGINT) AS sp,
         CAST(sum(v) OVER w AS BIGINT) AS sv,
         CAST(sum(p * p) OVER w AS BIGINT) AS spp,
         CAST(sum(v * v) OVER w AS BIGINT) AS svv,
         CAST(sum(p * v) OVER w AS BIGINT) AS spv
  FROM daily
  WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, k AS n_days,
       CASE WHEN (k * spp - sp * sp) > 0 AND (k * svv - sv * sv) > 0 THEN
         {R("((CAST(k AS DOUBLE) * CAST(spv AS DOUBLE)"
            "   - CAST(sp AS DOUBLE) * CAST(sv AS DOUBLE))"
            " / (sqrt(CAST(k AS DOUBLE) * CAST(spp AS DOUBLE)"
            "         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))"
            "    * sqrt(CAST(k AS DOUBLE) * CAST(svv AS DOUBLE)"
            "           - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))))", 6)}
       END AS corr_pv
FROM win
ORDER BY day
""",
)
def events_moving_corr_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            F.col("ts").cast("date").cast("string").alias("day"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_no"),
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("p"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("v"),
        )
    )
    w = W.orderBy("day_no").rangeBetween(-6, 0)
    win = daily.select(
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
        F.sum("p").over(w).cast("long").alias("sp"),
        F.sum("v").over(w).cast("long").alias("sv"),
        F.sum(F.col("p") * F.col("p")).over(w).cast("long").alias("spp"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("long").alias("svv"),
        F.sum(F.col("p") * F.col("v")).over(w).cast("long").alias("spv"),
    )
    k, sp, sv = F.col("k"), F.col("sp"), F.col("sv")
    spp, svv, spv = F.col("spp"), F.col("svv"), F.col("spv")
    kd = k.cast("double")
    num = kd * spv.cast("double") - sp.cast("double") * sv.cast("double")
    den = F.sqrt(kd * spp.cast("double") - sp.cast("double") * sp.cast("double")) * F.sqrt(
        kd * svv.cast("double") - sv.cast("double") * sv.cast("double")
    )
    return win.select(
        "day",
        k.alias("n_days"),
        F.when(
            ((k * spp - sp * sp) > 0) & ((k * svv - sv * sv) > 0),
            pround(num / den, 6),
        ).alias("corr_pv"),
    ).orderBy("day")
