"""Round-6 batch: revealed comparative advantage (trade statistics)
and customer repurchase-cycle percentiles.

House rules as everywhere: exact integer cents/count arithmetic
before any division, pround/sql_round twins, deterministic
tie-breaks, broadcast dimension joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..registry import query

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Balassa revealed comparative advantage: RCA(nation, part type) =
# (x_nt / x_n) / (x_t / x_T) = (x_nt·x_T) / (x_n·x_t) — the trade-
# statistics specialization index. One fact-table aggregation to the
# bounded (nation × type) cell table; all four x-terms re-aggregate
# from those cells (no second fact scan); the >1 specialization flag
# is an exact DECIMAL cross-multiplication, so float noise can never
# flip it. Dimension joins broadcast.
# ---------------------------------------------------------------------------

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "nation_type_rca",
    oracle=f"""
WITH cells AS (
  SELECT n.n_name AS nation, p.p_type AS ptype,
         CAST(sum({sql_cents(_REV)}) AS BIGINT) AS x_nt
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY n.n_name, p.p_type
), xn AS (
  SELECT nation, CAST(sum(x_nt) AS BIGINT) AS x_n FROM cells GROUP BY nation
), xt AS (
  SELECT ptype, CAST(sum(x_nt) AS BIGINT) AS x_t FROM cells GROUP BY ptype
), xtot AS (
  SELECT CAST(sum(x_nt) AS BIGINT) AS x_tt FROM cells
)
SELECT c.nation, c.ptype,
       {R("CAST(c.x_nt AS DOUBLE) / 100.0", 2)} AS revenue,
       {R("CAST(CAST(c.x_nt AS HUGEINT) * x.x_tt AS DOUBLE)"
          " / CAST(CAST(n.x_n AS HUGEINT) * t.x_t AS DOUBLE)", 6)} AS rca,
       CAST(CASE WHEN CAST(c.x_nt AS HUGEINT) * x.x_tt
                      > CAST(n.x_n AS HUGEINT) * t.x_t
                 THEN 1 ELSE 0 END AS BIGINT) AS specialized
FROM cells c
JOIN xn n ON c.nation = n.nation
JOIN xt t ON c.ptype = t.ptype
CROSS JOIN xtot x
""",
)
def nation_type_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = cents(F.expr(_REV))
    cells = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_type").alias("ptype"))
        .agg(F.sum(rev).cast("long").alias("x_nt"))
    )
    # margins as windows over the BOUNDED cell table (nations × types),
    # so the fact table is scanned exactly once — the partition-less
    # total window runs over ~10^3 cells, never the fact table
    margins = cells.select(
        "nation",
        "ptype",
        "x_nt",
        F.sum("x_nt").over(W.partitionBy("nation")).cast("long").alias("x_n"),
        F.sum("x_nt").over(W.partitionBy("ptype")).cast("long").alias("x_t"),
        F.sum("x_nt").over(W.partitionBy()).cast("long").alias("x_tt"),
    )
    num = F.col("x_nt").cast(_DEC) * F.col("x_tt").cast(_DEC)
    den = F.col("x_n").cast(_DEC) * F.col("x_t").cast(_DEC)
    return (
        margins.select(
            "nation",
            "ptype",
            pround(F.col("x_nt").cast("double") / F.lit(100.0), 2).alias("revenue"),
            pround(num.cast("double") / den.cast("double"), 6).alias("rca"),
            F.when(num > den, 1).otherwise(0).cast("long").alias("specialized"),
        )
    )


# ---------------------------------------------------------------------------
# Customer repurchase cycle: day gaps between consecutive orders per
# customer (lag window partitioned by the high-cardinality customer
# key — per-partition work is the per-customer order count, bounded),
# summarized per market segment with exact integer-day discrete
# percentiles (actual data values — no interpolation, bit-exact) and
# an exact-ratio mean.
# ---------------------------------------------------------------------------


@query(
    "customer_repurchase_cycle",
    oracle=f"""
WITH seq AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE)
           - lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap
  FROM orders
), gaps AS (
  SELECT c.c_mktsegment AS segment, CAST(s.gap AS BIGINT) AS gap
  FROM seq s JOIN customer c ON s.o_custkey = c.c_custkey
  WHERE s.gap IS NOT NULL
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap, 0.25) AS BIGINT) AS p25_days,
       CAST(quantile_disc(gap, 0.50) AS BIGINT) AS median_days,
       CAST(quantile_disc(gap, 0.90) AS BIGINT) AS p90_days,
       {R("CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS mean_days
FROM gaps
GROUP BY segment
ORDER BY segment
""",
)
def customer_repurchase_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wseq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(wseq),
        )
        .cast("long")
        .alias("gap"),
    ).filter(F.col("gap").isNotNull())
    # orders x customer is fact x fact at 100 TB: no broadcast hint —
    # the 8 GB broadcast limit makes a customer-side broadcast a
    # scale-killer; let AQE pick the shuffle join strategy.
    gaps = seq.join(cust, seq.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "gap"
    )
    return (
        gaps.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY gap)")
            .cast("long")
            .alias("p25_days"),
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY gap)")
            .cast("long")
            .alias("median_days"),
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY gap)")
            .cast("long")
            .alias("p90_days"),
            pround(
                F.sum("gap").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("mean_days"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Trailing-7-day active users per day ("rolling WAU") — a rolling
# COUNT DISTINCT, which no window frame can compute at scale.
# Scale-correct rewrite: each distinct (user, day) pair fans out to
# the 7 calendar days it keeps the user active for (bounded 7×
# explode of the deduplicated pair set — linear, never the raw event
# stream), then an exact two-stage distinct count per day; ghost days
# beyond the observed calendar are trimmed by joining the day spine.
# Stickiness = DAU / rolling-7d actives, exact-integer ratio.
# ---------------------------------------------------------------------------


@query(
    "events_rolling_7d_active_users",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), spine AS (
  SELECT DISTINCT day FROM ud
), fan AS (
  SELECT u.user_id, u.day + CAST(k AS INTEGER) AS tday
  FROM ud u, unnest(range(0, 7)) AS t(k)
), act AS (
  SELECT f.tday AS day, CAST(count(DISTINCT f.user_id) AS BIGINT) AS active_7d
  FROM fan f JOIN spine s ON f.tday = s.day
  GROUP BY f.tday
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
)
SELECT strftime(a.day, '%Y-%m-%d') AS day, d.dau, a.active_7d,
       {R("CAST(d.dau AS DOUBLE) / CAST(a.active_7d AS DOUBLE)", 4)} AS stickiness
FROM act a JOIN dau d ON a.day = d.day
ORDER BY day
""",
)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    spine = ud.select("day").distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 6))
        ).alias("tday"),
    )
    act = (
        fan.join(spine.withColumnRenamed("day", "tday"), "tday")
        .groupBy("tday")
        .agg(F.countDistinct("user_id").cast("long").alias("active_7d"))
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        act.join(dau, act.tday == dau.day)
        .select(
            F.date_format("tday", "yyyy-MM-dd").alias("day"),
            "dau",
            "active_7d",
            pround(
                F.col("dau").cast("double") / F.col("active_7d").cast("double"), 4
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Tukey median polish (two full row/column sweeps) of the monthly
# revenue matrix (month × priority) — the robust two-way
# decomposition a statistics agency uses where outlier months would
# poison a mean-based ANOVA. The fact table is aggregated ONCE to the
# bounded cell matrix (~#months × 5); every sweep is a discrete-median
# groupBy + broadcast join-back over that matrix; residuals stay exact
# integer cents throughout (integer medians subtracted from integers —
# the whole polish is float-free until the final display division).
# ---------------------------------------------------------------------------


def _mp_med(part: str, src: str) -> str:
    return (
        f"SELECT {part}, CAST(quantile_disc(resid, 0.50) AS BIGINT) AS med "
        f"FROM {src} GROUP BY {part}"
    )


@query(
    "orders_median_polish",
    oracle=f"""
WITH cells AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority AS priority,
         CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS v,
         CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS resid
  FROM orders GROUP BY 1, 2
), rm1 AS ({_mp_med("month", "cells")}),
s1 AS (
  SELECT c.month, c.priority, c.v, c.resid - r.med AS resid, r.med AS row_eff
  FROM cells c JOIN rm1 r ON c.month = r.month
), cm1 AS ({_mp_med("priority", "s1")}),
s2 AS (
  SELECT s.month, s.priority, s.v, s.resid - m.med AS resid, s.row_eff,
         m.med AS col_eff
  FROM s1 s JOIN cm1 m ON s.priority = m.priority
), rm2 AS ({_mp_med("month", "s2")}),
s3 AS (
  SELECT s.month, s.priority, s.v, s.resid - r.med AS resid,
         s.row_eff + r.med AS row_eff, s.col_eff
  FROM s2 s JOIN rm2 r ON s.month = r.month
), cm2 AS ({_mp_med("priority", "s3")}),
s4 AS (
  SELECT s.month, s.priority, s.v, s.resid - m.med AS resid, s.row_eff,
         s.col_eff + m.med AS col_eff
  FROM s3 s JOIN cm2 m ON s.priority = m.priority
)
SELECT month, priority,
       {R("CAST(v AS DOUBLE) / 100.0", 2)} AS revenue,
       {R("CAST(row_eff AS DOUBLE) / 100.0", 2)} AS row_eff,
       {R("CAST(col_eff AS DOUBLE) / 100.0", 2)} AS col_eff,
       {R("CAST(resid AS DOUBLE) / 100.0", 2)} AS residual
FROM s4
ORDER BY month, priority
""",
)
def orders_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.sum(cents("o_totalprice")).cast("long").alias("v"))
    cells = cells.withColumn("resid", F.col("v"))

    def med_disc():
        return F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY resid)").cast(
            "long"
        )

    def sweep(df: DataFrame, dim: str, eff_col: str) -> DataFrame:
        med = df.groupBy(dim).agg(med_disc().alias("med"))
        out = df.join(F.broadcast(med), dim).withColumn(
            "resid", F.col("resid") - F.col("med")
        )
        if eff_col in df.columns:
            out = out.withColumn(eff_col, F.col(eff_col) + F.col("med"))
        else:
            out = out.withColumn(eff_col, F.col("med"))
        return out.drop("med")

    s = sweep(cells, "month", "row_eff")
    s = sweep(s, "priority", "col_eff")
    s = sweep(s, "month", "row_eff")
    s = sweep(s, "priority", "col_eff")
    return s.select(
        "month",
        "priority",
        pround(F.col("v").cast("double") / F.lit(100.0), 2).alias("revenue"),
        pround(F.col("row_eff").cast("double") / F.lit(100.0), 2).alias("row_eff"),
        pround(F.col("col_eff").cast("double") / F.lit(100.0), 2).alias("col_eff"),
        pround(F.col("resid").cast("double") / F.lit(100.0), 2).alias("residual"),
    ).orderBy("month", "priority")


# ---------------------------------------------------------------------------
# Lorenz curve by revenue decile — the inequality publication table
# behind the Gini number. Customers are ranked by exact-cents revenue
# with the house two-pass bucketed prefix sum (the gini machinery:
# 256 value-range buckets off a broadcast max, rank windows partition
# by bucket, the only global window is over the 256-row bucket
# aggregate); deciles come from the exact integer rank, and the
# cumulative share window runs over the 10-row decile aggregate.
# ---------------------------------------------------------------------------


@query(
    "orders_lorenz_deciles",
    oracle=f"""
WITH rev AS (
  SELECT o_custkey, CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_c,
         CAST(row_number() OVER (ORDER BY rev_c, o_custkey) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM rev
), dec AS (
  SELECT ((rk - 1) * 10) // n + 1 AS decile, rev_c FROM ranked
), agg AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(rev_c) AS BIGINT) AS dec_c
  FROM dec GROUP BY decile
), tot AS (
  SELECT CAST(sum(dec_c) AS HUGEINT) AS tot_c FROM agg
)
SELECT a.decile, a.n_cust,
       {R("CAST(a.dec_c AS DOUBLE) / 100.0", 2)} AS revenue,
       {R("CAST(a.dec_c AS DOUBLE) / CAST(t.tot_c AS DOUBLE)", 6)} AS share,
       {R("CAST(sum(a.dec_c) OVER (ORDER BY a.decile"
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
          " / CAST(t.tot_c AS DOUBLE)", 6)} AS cum_share
FROM agg a, tot t
ORDER BY a.decile
""",
)
def orders_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast("long").alias("rev_c")
    )
    mx = rev.agg(F.max("rev_c").alias("mx"), F.count(F.lit(1)).cast("long").alias("n"))
    bucketed = rev.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "rev_c",
        "n",
        (F.col("rev_c") * 256 / (F.col("mx") + 1)).cast("long").alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("bn"))
    woff = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("bn").over(woff), F.lit(0)).cast("long").alias("off"),
    )
    wrank = W.partitionBy("bucket").orderBy("rev_c", "o_custkey")
    dec = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "rev_c",
            "n",
            (F.col("off") + F.row_number().over(wrank)).cast("long").alias("rk"),
        )
        # exact integer floor division — immune to double-quotient edge
        # rounding at any n (matches DuckDB's `//`)
        .select("rev_c", (F.expr("((rk - 1) * 10) div n") + 1).alias("decile"))
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev_c").cast("long").alias("dec_c"),
    )
    tot = agg.agg(F.sum(F.col("dec_c").cast(_DEC)).alias("tot_c"))
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_cust",
            pround(F.col("dec_c").cast("double") / F.lit(100.0), 2).alias("revenue"),
            pround(
                F.col("dec_c").cast("double") / F.col("tot_c").cast("double"), 6
            ).alias("share"),
            pround(
                F.sum("dec_c").over(wcum).cast("double")
                / F.col("tot_c").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Contribution-to-index decomposition: each part type's percentage-
# point contribution to the Laspeyres price index change vs the 1995
# base basket — the "shelter contributed 0.8pp to CPI" release table,
# and the companion to price_index_fisher. Per-part unit prices use
# the identical portable rounding as the index query; contributions
# are exact DECIMAL basket sums (Σ (up_t − up0)·q0 per type) over the
# broadcast base basket, divided ONCE by the broadcast base-year
# denominator. Σ_type contribution_pp = L − 100 exactly by
# construction.
# ---------------------------------------------------------------------------


@query(
    "price_index_contributions",
    oracle=f"""
WITH py AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_partkey,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS extc,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty
  FROM lineitem GROUP BY year(l_shipdate), l_partkey
), up AS (
  SELECT yr, l_partkey, qty,
         CAST(floor(CAST(extc AS DOUBLE) / qty + 0.5) AS BIGINT) AS upc
  FROM py WHERE qty > 0
), base AS (
  SELECT l_partkey, qty AS q0, upc AS upc0 FROM up WHERE yr = 1995
), cells AS (
  SELECT u.yr, p.p_type AS ptype,
         CAST(sum(CAST(u.upc - b.upc0 AS HUGEINT) * b.q0) AS HUGEINT) AS delta,
         CAST(sum(CAST(b.upc0 AS HUGEINT) * b.q0) AS HUGEINT) AS w0
  FROM up u
  JOIN base b USING (l_partkey)
  JOIN part p ON u.l_partkey = p.p_partkey
  GROUP BY u.yr, p.p_type
)
SELECT c.yr, c.ptype,
       {R("CAST(c.w0 AS DOUBLE) / CAST(c.d0 AS DOUBLE) * 100.0", 4)} AS weight_pct,
       {R("CAST(c.delta AS DOUBLE) / CAST(c.d0 AS DOUBLE) * 100.0", 4)} AS contribution_pp
FROM (SELECT yr, ptype, delta, w0,
             CAST(sum(w0) OVER (PARTITION BY yr) AS HUGEINT) AS d0
      FROM cells) c
ORDER BY c.yr, c.ptype
""",
)
def price_index_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    py = li.groupBy(
        F.year("l_shipdate").cast("long").alias("yr"), "l_partkey"
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")).alias(
            "extc"
        ),
        F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long")).alias("qty"),
    )
    up = py.filter(F.col("qty") > 0).select(
        "yr",
        "l_partkey",
        "qty",
        F.floor(F.col("extc").cast("double") / F.col("qty") + 0.5)
        .cast("long")
        .alias("upc"),
    )
    base = up.filter(F.col("yr") == 1995).select(
        "l_partkey", F.col("qty").alias("q0"), F.col("upc").alias("upc0")
    )
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    cells = (
        up.join(F.broadcast(base), "l_partkey")
        .join(F.broadcast(part), up.l_partkey == part.p_partkey)
        .groupBy("yr", F.col("p_type").alias("ptype"))
        .agg(
            F.sum(dec((F.col("upc") - F.col("upc0")) * F.col("q0"))).alias("delta"),
            F.sum(dec(F.col("upc0") * F.col("q0"))).alias("w0"),
        )
    )
    # per-year MATCHED-basket denominator (the same basket Laspeyres
    # uses), as a window over the bounded (yr x type) cell table
    cells = cells.withColumn("d0", F.sum("w0").over(W.partitionBy("yr")))
    return (
        cells
        .select(
            "yr",
            "ptype",
            pround(
                F.col("w0").cast("double") / F.col("d0").cast("double") * F.lit(100.0),
                4,
            ).alias("weight_pct"),
            pround(
                F.col("delta").cast("double")
                / F.col("d0").cast("double")
                * F.lit(100.0),
                4,
            ).alias("contribution_pp"),
        )
        .orderBy("yr", "ptype")
    )


# ---------------------------------------------------------------------------
# Burstiness census: Fano factor (variance/mean of daily counts) and
# the Goh–Barabási burstiness index B = (σ−μ)/(σ+μ) per event type —
# the "is this traffic Poisson?" monitor. All moments are exact
# integer sums over the bounded daily aggregate; Fano is a single
# exact-ratio division ((nΣx² − (Σx)²) / (n·Σx)); σ enters only
# through one sqrt of an identical double.
# ---------------------------------------------------------------------------


@query(
    "events_burstiness_fano",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
       {R("CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)", 4)} AS mean_daily,
       {R("CAST(n_days * s2 - s * s AS DOUBLE) / (CAST(n_days AS DOUBLE) * CAST(s AS DOUBLE))", 6)} AS fano,
       {R("(sqrt(CAST(n_days * s2 - s * s AS DOUBLE)) / CAST(n_days AS DOUBLE)"
          " - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))"
          " / (sqrt(CAST(n_days * s2 - s * s AS DOUBLE)) / CAST(n_days AS DOUBLE)"
          " + CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))", 6)} AS burstiness
FROM m
ORDER BY event_type
""",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("n").cast(_DEC)).alias("s"),
        F.sum((F.col("n").cast(_DEC) * F.col("n").cast(_DEC))).alias("s2"),
    )
    var_num = (F.col("n_days") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
    n_d = F.col("n_days").cast("double")
    s_d = F.col("s").cast("double")
    sigma = F.sqrt(var_num) / n_d
    mu = s_d / n_d
    return m.select(
        "event_type",
        "n_days",
        pround(mu, 4).alias("mean_daily"),
        pround(var_num / (n_d * s_d), 6).alias("fano"),
        pround((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Event-type co-occurrence lift: for each unordered pair of event
# types, how much more often does one user do BOTH than independence
# predicts? lift = c_xy·U / (c_x·c_y) — exact integer cross products,
# one division. The pair explode is the per-user distinct-type
# self-join: bounded K² fan-out per user (K = #types), linear in
# users; type margins re-aggregate from the deduplicated (user, type)
# set, single fact scan feeds everything.
# ---------------------------------------------------------------------------


@query(
    "events_type_cooccurrence",
    oracle=f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), tots AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cu FROM ut GROUP BY event_type
), u AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS c_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.c_both, ta.cu AS c_a, tb.cu AS c_b,
       {R("CAST(CAST(p.c_both AS HUGEINT) * u.n_users AS DOUBLE)"
          " / CAST(CAST(ta.cu AS HUGEINT) * tb.cu AS DOUBLE)", 6)} AS lift
FROM pairs p
JOIN tots ta ON p.type_a = ta.event_type
JOIN tots tb ON p.type_b = tb.event_type
CROSS JOIN u
ORDER BY p.type_a, p.type_b
""",
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tots = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("cu"))
    u = ut.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    b = ut.select(F.col("user_id").alias("u2"), F.col("event_type").alias("type_b"))
    pairs = (
        ut.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_both"))
    )
    ta = tots.select(F.col("event_type").alias("type_a"), F.col("cu").alias("c_a"))
    tb = tots.select(F.col("event_type").alias("type_b"), F.col("cu").alias("c_b"))
    lift_num = F.col("c_both").cast(_DEC) * F.col("n_users").cast(_DEC)
    lift_den = F.col("c_a").cast(_DEC) * F.col("c_b").cast(_DEC)
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(u))
        .select(
            "type_a",
            "type_b",
            "c_both",
            "c_a",
            "c_b",
            pround(lift_num.cast("double") / lift_den.cast("double"), 6).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )
