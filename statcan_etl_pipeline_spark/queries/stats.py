"""Distribution-comparison statistics: two-sample Kolmogorov–Smirnov,
Mann–Whitney U (rank-sum), and one-way ANOVA — the hypothesis-testing
layer of a statistics-agency QA pipeline (is this month's revision
distribution consistent with last month's?).

House rules: all pairwise/rank machinery runs on EXACT integers
(cents values, counts, cross-multiplied cumulative counts in
DECIMAL(38,0)/HUGEINT), with at most ONE double division at the end
of each formula, so both engines agree bit-for-bit before pround.

Scale notes (100 TB): the KS/MWU cumulative counts use the house
two-pass distributed prefix sum — per-value counts are range-bucketed
(256 buckets off a broadcast min/max singleton), the only
partition-less window runs over the 256-row bucket aggregate, and the
within-bucket rank window is partitioned by bucket. No window ever
scans the raw fact table; no sort of the full distinct-value set.
ANOVA is a single map-combinable aggregation (5 groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..registry import query

_DEC = "decimal(38,0)"


def _cum_two_group(vals: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Inclusive cumulative counts (cum1, cum2) over v-ascending order for
    a two-group per-distinct-value count table ``vals[v, c1, c2]``.

    Two-pass distributed prefix sum (same shape as gini/ABC/greedy
    packing): range-bucket on a broadcast min/max singleton, exclusive
    bucket-level offsets over the bounded bucket aggregate, then a
    within-bucket window partitioned by bucket.
    """
    rng = vals.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    b = vals.crossJoin(F.broadcast(rng)).select(
        "v",
        "c1",
        "c2",
        ((F.col("v") - F.col("mn")) * n_buckets / (F.col("mx") - F.col("mn") + 1))
        .cast("long")
        .alias("bucket"),
    )
    per = b.groupBy("bucket").agg(
        F.sum("c1").cast("long").alias("b1"),
        F.sum("c2").cast("long").alias("b2"),
    )
    woff = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = per.select(
        "bucket",
        F.coalesce(F.sum("b1").over(woff), F.lit(0)).cast("long").alias("off1"),
        F.coalesce(F.sum("b2").over(woff), F.lit(0)).cast("long").alias("off2"),
    )
    win = W.partitionBy("bucket").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    return b.join(F.broadcast(offs), "bucket").select(
        "v",
        "c1",
        "c2",
        (F.col("off1") + F.sum("c1").over(win)).cast("long").alias("cum1"),
        (F.col("off2") + F.sum("c2").over(win)).cast("long").alias("cum2"),
    )


# ---------------------------------------------------------------------------
# Two-sample KS: D = sup_v |F1(v) - F2(v)| between the order-value
# distributions of URGENT vs LOW priority orders. The supremum is
# computed as max |cum1*n2 - cum2*n1| over distinct values (exact
# DECIMAL cross-multiplication — no per-row double ECDFs), with the
# single double division (and the achieving value) taken from the top
# row of an ordered LIMIT 1 (TakeOrdered, not a global sort).
# ---------------------------------------------------------------------------


@query(
    "ks_order_value_by_priority",
    oracle=f"""
WITH sel AS (
  SELECT {sql_cents("o_totalprice")} AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g2
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), vals AS (
  SELECT v, CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
  FROM sel GROUP BY v
), cum AS (
  SELECT v,
         sum(c1) OVER (ORDER BY v) AS cum1,
         sum(c2) OVER (ORDER BY v) AS cum2
  FROM vals
), tot AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM vals
), d AS (
  SELECT v, abs(CAST(cum1 AS HUGEINT) * (SELECT n2 FROM tot)
              - CAST(cum2 AS HUGEINT) * (SELECT n1 FROM tot)) AS dn
  FROM cum
)
SELECT t.n1, t.n2,
       {R("CAST(d.dn AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))", 6)} AS ks_d,
       {R("CAST(d.v AS DOUBLE) / 100.0", 2)} AS at_value
FROM d, tot t
ORDER BY d.dn DESC, d.v
LIMIT 1
""",
)
def ks_order_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sel = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        cents("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g1"),
        F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0).alias("g2"),
    )
    vals = sel.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    cum = _cum_two_group(vals)
    tot = vals.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("cum1").cast(_DEC) * F.col("n2")
            - F.col("cum2").cast(_DEC) * F.col("n1")
        ).alias("dn"),
    )
    return (
        d.orderBy(F.desc("dn"), "v")
        .limit(1)
        .select(
            "n1",
            "n2",
            pround(
                F.col("dn").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ).alias("ks_d"),
            pround(F.col("v").cast("double") / F.lit(100.0), 2).alias("at_value"),
        )
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U between the order values of BUILDING vs MACHINERY
# customers. Doubled-U stays integer under midrank tie handling:
#   2·U1 = Σ_v c1(v) · (2·cum2_less(v) + c2(v))
# accumulated exactly in DECIMAL(38,0); AUC (common-language effect
# size) = U1/(n1·n2) is the single double division.
# ---------------------------------------------------------------------------


@query(
    "mwu_order_value_segments",
    oracle=f"""
WITH sel AS (
  SELECT {sql_cents("o.o_totalprice")} AS v,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1,
         CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS g2
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
), vals AS (
  SELECT v, CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
  FROM sel GROUP BY v
), cum AS (
  SELECT v, c1, c2,
         sum(c1) OVER (ORDER BY v) AS cum1,
         sum(c2) OVER (ORDER BY v) AS cum2
  FROM vals
), tot AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM vals
), acc AS (
  SELECT sum(CAST(c1 AS HUGEINT) * (2 * (cum2 - c2) + c2)) AS two_u1 FROM cum
)
SELECT t.n1, t.n2,
       {R("CAST(a.two_u1 AS DOUBLE) / 2.0", 1)} AS u1,
       {R("CAST(a.two_u1 AS DOUBLE) / (2.0 * CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))", 6)} AS auc
FROM acc a, tot t
""",
)
def mwu_order_value_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # The two-segment filter keeps ~40% of customer — still fact-scale
    # at 100 TB, so no broadcast hint (caught by the r9 registry-wide
    # ReusedExchange-aware plan sweep); shuffle join on c_custkey.
    sel = (
        orders.join(
            cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")),
            orders.o_custkey == cust.c_custkey,
        )
        .select(
            cents("o_totalprice").alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("g1"),
            F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0).alias("g2"),
        )
    )
    vals = sel.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    cum = _cum_two_group(vals)
    tot = vals.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    acc = cum.agg(
        F.sum(
            F.col("c1").cast(_DEC)
            * (2 * (F.col("cum2") - F.col("c2")) + F.col("c2")).cast(_DEC)
        ).alias("two_u1")
    )
    return acc.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        pround(F.col("two_u1").cast("double") / F.lit(2.0), 1).alias("u1"),
        pround(
            F.col("two_u1").cast("double")
            / (F.lit(2.0) * F.col("n1").cast("double") * F.col("n2").cast("double")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA of order value across the 5 order priorities. Group
# moments (n, Σx, Σx²) are exact integer cents sums. The per-group
# s²/n terms are doubles (each computed identically in both engines);
# the cross-group Σ terms would normally be order-dependent, so both
# engines run the SAME left fold in the SAME (priority-sorted) order —
# Spark `aggregate` over array_sort(collect_list(...)), DuckDB
# `list_reduce(list(... ORDER BY ...))` — making the unrounded sum
# bit-identical (the EWMA precedent, here over a 5-element list).
# ---------------------------------------------------------------------------


@query(
    "anova_order_value_by_priority",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({sql_cents("o_totalprice")}) AS HUGEINT) AS s,
         CAST(sum(CAST({sql_cents("o_totalprice")} AS HUGEINT)
                  * {sql_cents("o_totalprice")}) AS HUGEINT) AS q
  FROM orders GROUP BY o_orderpriority
), terms AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_orders,
         CAST(sum(s) AS HUGEINT) AS s_all,
         CAST(sum(q) AS HUGEINT) AS q_all,
         list_reduce(
           list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                ORDER BY o_orderpriority),
           (a, b) -> a + b) AS sum_terms
  FROM g
), ss AS (
  SELECT k, n_orders,
         sum_terms - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                     / CAST(n_orders AS DOUBLE) AS ssb,
         CAST(q_all AS DOUBLE) - sum_terms AS ssw
  FROM terms
)
SELECT k, n_orders,
       {R("ssb / 10000.0", 2)} AS ss_between,
       {R("ssw / 10000.0", 2)} AS ss_within,
       {R("(ssb / (CAST(k AS DOUBLE) - 1.0))"
          " / (ssw / (CAST(n_orders AS DOUBLE) - CAST(k AS DOUBLE)))", 4)} AS f_stat,
       {R("ssb / (ssb + ssw)", 6)} AS eta_sq
FROM ss
""",
)
def anova_order_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vc = cents("o_totalprice")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(vc).cast(_DEC).alias("s"),
        F.sum((vc * vc).cast(_DEC)).alias("q"),
    )
    term = (
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    )
    terms = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_orders"),
        F.sum("s").alias("s_all"),
        F.sum("q").alias("q_all"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("o_orderpriority").alias("g"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("sum_terms"),
    )
    ss = terms.select(
        "k",
        "n_orders",
        (
            F.col("sum_terms")
            - F.col("s_all").cast("double")
            * F.col("s_all").cast("double")
            / F.col("n_orders").cast("double")
        ).alias("ssb"),
        (F.col("q_all").cast("double") - F.col("sum_terms")).alias("ssw"),
    )
    k_d = F.col("k").cast("double")
    n_d = F.col("n_orders").cast("double")
    return ss.select(
        "k",
        "n_orders",
        pround(F.col("ssb") / F.lit(10000.0), 2).alias("ss_between"),
        pround(F.col("ssw") / F.lit(10000.0), 2).alias("ss_within"),
        pround(
            (F.col("ssb") / (k_d - F.lit(1.0))) / (F.col("ssw") / (n_d - k_d)), 4
        ).alias("f_stat"),
        pround(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )
