"""Rank-based statistics round 2: exact Spearman rank correlation
(midranks from the two-pass distributed prefix sum — no global sort)
and the Wald–Wolfowitz runs test on daily revenue.

House rules: midranks doubled to stay integer, all moment sums in
DECIMAL(38,0)/HUGEINT, one double division (and sqrt of identical
doubles) at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..registry import query
from .stats import _cum_two_group

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Exact Spearman rho between order value and the customer's account
# balance (is willingness-to-spend monotone in wealth?). Midranks are
# computed per DISTINCT value with the bucketed two-pass prefix sum
# (doubled midrank 2r = 2·cum_less + c + 1 stays integer, ties
# handled exactly), joined back to the fact rows on the value key —
# never a global orderBy window over the fact table. Pearson on the
# doubled midranks uses exact DECIMAL moments; scale/shift invariance
# of correlation makes the doubling harmless.
# ---------------------------------------------------------------------------


def _sql_midrank(tbl: str, vcol: str) -> str:
    """cum-less + midrank CTE text over distinct values of {vcol}."""
    return f"""
  SELECT {vcol} AS v,
         2 * (sum(c) OVER (ORDER BY {vcol}) - c) + c + 1 AS m2
  FROM (SELECT {vcol}, CAST(count(*) AS BIGINT) AS c FROM {tbl} GROUP BY {vcol})
"""


@query(
    "spearman_price_acctbal",
    oracle=f"""
WITH base AS (
  SELECT {sql_cents("o.o_totalprice")} AS x,
         {sql_cents("c.c_acctbal")} AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), rx AS ({_sql_midrank("base", "x")}
), ry AS ({_sql_midrank("base", "y")}
), ranked AS (
  SELECT rx.m2 AS mx, ry.m2 AS my
  FROM base b JOIN rx ON b.x = rx.v JOIN ry ON b.y = ry.v
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(mx AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(my AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(mx AS HUGEINT) * my) AS HUGEINT) AS sxy,
         CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sxx,
         CAST(sum(CAST(my AS HUGEINT) * my) AS HUGEINT) AS syy
  FROM ranked
)
SELECT n,
       {R("CAST(n * sxy - sx * sy AS DOUBLE)"
          " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
          "    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)} AS spearman_rho
FROM mom
""",
)
def spearman_price_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # orders x customer is fact x fact at 100 TB: shuffle join, no hint.
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        cents("o_totalprice").alias("x"), cents("c_acctbal").alias("y")
    )

    def midranks(col: str) -> DataFrame:
        vals = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c1"),
            F.lit(0).cast("long").alias("c2"),
        )
        cum = _cum_two_group(vals)
        # inclusive cum1 -> exclusive cum_less = cum1 - c1; doubled midrank
        return cum.select(
            "v",
            (2 * (F.col("cum1") - F.col("c1")) + F.col("c1") + 1)
            .cast("long")
            .alias("m2"),
        )

    rx = midranks("x").withColumnRenamed("m2", "mx").withColumnRenamed("v", "vx")
    ry = midranks("y").withColumnRenamed("m2", "my").withColumnRenamed("v", "vy")
    ranked = base.join(rx, base.x == rx.vx).join(ry, base.y == ry.vy).select("mx", "my")
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("mx").cast(_DEC)).alias("sx"),
        F.sum(F.col("my").cast(_DEC)).alias("sy"),
        F.sum((F.col("mx").cast(_DEC) * F.col("my").cast(_DEC))).alias("sxy"),
        F.sum((F.col("mx").cast(_DEC) * F.col("mx").cast(_DEC))).alias("sxx"),
        F.sum((F.col("my").cast(_DEC) * F.col("my").cast(_DEC))).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return mom.select("n", pround(num / (dx * dy), 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily revenue: is the above/below-median
# sign sequence random, or does revenue trend/cluster? The daily
# series is calendar-bounded, the median is a percentile_disc pick
# (bit-exact), runs are counted with a lag over the bounded series,
# and the z-score's mean/variance come from exact integer n1, n2, R.
# ---------------------------------------------------------------------------


@query(
    "orders_runs_test_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), med AS (
  SELECT CAST(quantile_disc(rev, 0.50) AS BIGINT) AS m FROM daily
), signs AS (
  SELECT day, CASE WHEN rev > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
  FROM daily
), runs AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
  FROM signs
), agg AS (
  SELECT CAST(sum(new_run) AS BIGINT) AS r,
         CAST(sum(s) AS BIGINT) AS n1,
         CAST(count(*) - sum(s) AS BIGINT) AS n2
  FROM runs
)
SELECT n1, n2, r,
       {R("1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
          " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))", 4)} AS expected_runs,
       {R("(CAST(r AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
          " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))"
          " / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
          " * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
          "    - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))"
          " / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
          "    * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
          "    * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))", 4)} AS z_score
FROM agg
""",
)
def orders_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents("o_totalprice")).cast("long").alias("rev")
    )
    med = daily.agg(
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY rev)")
        .cast("long")
        .alias("m")
    )
    signs = daily.crossJoin(F.broadcast(med)).select(
        "day", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s")
    )
    wd = W.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    r_d = F.col("r").cast("double")
    exp_r = F.lit(1.0) + F.lit(2.0) * n1 * n2 / (n1 + n2)
    var_r = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    return agg.select(
        "n1",
        "n2",
        "r",
        pround(exp_r, 4).alias("expected_runs"),
        pround((r_d - exp_r) / F.sqrt(var_r), 4).alias("z_score"),
    )
