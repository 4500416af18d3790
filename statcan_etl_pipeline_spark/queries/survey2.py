"""Survey-methodology batch 2: the estimation / variance / allocation
operators a statistics agency runs after calibration — a
Kruskal–Wallis rank test, type-2 winsorized totals, delete-a-group
jackknife variance, Neyman optimal sample allocation, and the Atkinson
inequality index.

Cross-engine exactness strategy (same discipline as stats.py /
survey.py):
- ranks, tie counts, and winsorized totals are exact integer (cents /
  doubled-midrank) sums in DECIMAL(38,0) <-> HUGEINT;
- any cross-group sum of DOUBLES runs as the SAME left fold in the
  SAME sorted order on both engines (Spark `aggregate` over
  `array_sort(collect_list(...))`, DuckDB `list_reduce(list(...
  ORDER BY ...))`) — the ANOVA precedent;
- `sqrt` is IEEE-754 correctly rounded in both JVMs and libstdc++, so
  standard errors / stddevs derived from exact integer moments are
  bit-identical;
- harmonic means avoid math-library `ln`/`exp` entirely: 1/x over
  integer cents is the exact integer `10^15 div x`, summed exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, money_sum, pround, sql_cents, sql_money_sum, sql_round as R
from ..registry import query

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Kruskal–Wallis H across the 5 order priorities (the rank-based
# one-way ANOVA). Midranks stay integer by working with DOUBLED ranks:
# an element of value v (cumulative count-before cb, tie size t) has
# doubled midrank 2·cb + t + 1, so each group's doubled rank sum R2_j
# is an exact DECIMAL/HUGEINT integer. Σ_j R_j²/n_j then folds
# per-group doubles in priority-sorted order (ANOVA precedent), and
# the tie correction Σ(t³−t)/(N³−N) is exact-integer over double.
# Scale: one groupBy(v, g), one groupBy(v), one cumulative window over
# DISTINCT cents values (bounded by price cardinality, not row count),
# then a 5-row fold.
# ---------------------------------------------------------------------------
@query(
    "kruskal_wallis_order_value",
    oracle=f"""
WITH per AS (
  SELECT {sql_cents("o_totalprice")} AS v, o_orderpriority AS g FROM orders
), vg AS (
  SELECT v, g, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY v, g
), vt AS (
  SELECT v, CAST(sum(c) AS BIGINT) AS t FROM vg GROUP BY v
), vt2 AS (
  SELECT v, t,
         CAST(coalesce(sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM vt
), rg AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
         sum(CAST(c AS HUGEINT) * (2 * cb + t + 1)) AS r2
  FROM vg JOIN vt2 USING (v) GROUP BY g
), tie AS (
  SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie3 FROM vt
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n_orders,
         list_reduce(
           list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
                / (4.0 * CAST(n_g AS DOUBLE)) ORDER BY g),
           (a, b) -> a + b) AS sum_terms
  FROM rg
), h AS (
  SELECT k, n_orders,
         12.0 * sum_terms / (CAST(n_orders AS DOUBLE) * (CAST(n_orders AS DOUBLE) + 1.0))
           - 3.0 * (CAST(n_orders AS DOUBLE) + 1.0) AS h_raw,
         1.0 - CAST(tie3 AS DOUBLE)
           / (CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)
              - CAST(n_orders AS DOUBLE)) AS c_tie
  FROM agg CROSS JOIN tie
)
SELECT k, n_orders, {R("h_raw", 6)} AS h_stat, {R("h_raw / c_tie", 6)} AS h_corrected
FROM h
""",
)
def kruskal_wallis_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per = orders.select(
        cents("o_totalprice").alias("v"), F.col("o_orderpriority").alias("g")
    )
    vg = per.groupBy("v", "g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vt = vg.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    vt2 = vt.select(
        "v", "t", F.coalesce(F.sum("t").over(wcum), F.lit(0)).cast("long").alias("cb")
    )
    rg = (
        vg.join(vt2, "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(
                F.col("c").cast(_DEC)
                * (2 * F.col("cb") + F.col("t") + 1).cast(_DEC)
            ).alias("r2"),
        )
    )
    tie = vt.agg(
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("tie3")
    )
    agg = rg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n_orders"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("g"), F.col("r2"), F.col("n_g")))
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + x["r2"].cast("double") * x["r2"].cast("double")
            / (F.lit(4.0) * x["n_g"].cast("double")),
        ).alias("sum_terms"),
    )
    n_d = F.col("n_orders").cast("double")
    h = agg.crossJoin(F.broadcast(tie)).select(
        "k",
        "n_orders",
        (
            F.lit(12.0) * F.col("sum_terms") / (n_d * (n_d + F.lit(1.0)))
            - F.lit(3.0) * (n_d + F.lit(1.0))
        ).alias("h_raw"),
        (
            F.lit(1.0)
            - F.col("tie3").cast("double") / (n_d * n_d * n_d - n_d)
        ).alias("c_tie"),
    )
    return h.select(
        "k",
        "n_orders",
        pround(F.col("h_raw"), 6).alias("h_stat"),
        pround(F.col("h_raw") / F.col("c_tie"), 6).alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# Type-2 winsorized total by market segment: order values above the
# segment's discrete P95 are replaced BY the P95 (the standard
# business-survey outlier treatment). percentile_disc returns an
# ACTUAL stored double (no interpolation), so the cap round-trips
# bit-exactly; the winsorized sum is then an exact integer cents sum.
# Scale: one 5-row cap aggregate broadcast back onto the fact table —
# two scans, no shuffle beyond the segment groupBys.
# ---------------------------------------------------------------------------
@query(
    "survey_winsorized_total",
    oracle=f"""
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), caps AS (
  SELECT segment, quantile_disc(price, 0.95) AS cap FROM j GROUP BY segment
)
SELECT j.segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN j.price > caps.cap THEN 1 ELSE 0 END) AS BIGINT) AS n_winsorized,
       {sql_money_sum("j.price")} AS raw_total,
       {sql_money_sum("least(j.price, caps.cap)")} AS winsorized_total,
       {R("CAST(caps.cap AS DOUBLE)", 2)} AS cap_value
FROM j JOIN caps USING (segment)
GROUP BY j.segment, caps.cap
ORDER BY j.segment
""",
)
def survey_winsorized_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("price")
    )
    caps = j.groupBy("segment").agg(
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY price)").alias("cap")
    )
    return (
        j.join(F.broadcast(caps), "segment")
        .groupBy("segment", "cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("price") > F.col("cap"), 1).otherwise(0))
            .cast("long")
            .alias("n_winsorized"),
            money_sum("price").alias("raw_total"),
            money_sum(F.least("price", "cap")).alias("winsorized_total"),
        )
        .select(
            "segment",
            "n_orders",
            "n_winsorized",
            "raw_total",
            "winsorized_total",
            pround(F.col("cap").cast("double"), 2).alias("cap_value"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Delete-a-group jackknife variance of total revenue per segment
# (G = 10 random groups). Customers are assigned to groups by an
# md5-hex digest (engine-portable, reproducible — the raking /
# feature-hash precedent). With T = Σ t_g the total and t_g the
# group totals (exact cents), the DAGJK variance collapses to
#   v = Σ_g (T − G·t_g)² / (G·(G−1))
# — the squared deviations stay exact DECIMAL/HUGEINT integers, and
# the SE is one IEEE-exact sqrt. Scale: a single groupBy(segment,
# jk_group) over the fact join; G is a constant.
# ---------------------------------------------------------------------------
_JK_G = 10


@query(
    "survey_jackknife_variance",
    oracle=f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(CAST('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 2)
              AS INTEGER) % {_JK_G} AS BIGINT) AS jk,
         {sql_cents("o.o_totalprice")} AS vc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), grp AS (
  SELECT segment, jk, CAST(sum(vc) AS HUGEINT) AS t_g,
         CAST(count(*) AS BIGINT) AS n_g
  FROM base GROUP BY segment, jk
), grid AS (
  -- every (segment, replicate) cell exists even when it captured zero
  -- rows: an empty delete-group is still a replicate and contributes
  -- (T - G*0)^2, otherwise the variance is silently understated
  SELECT s.segment, j.jk
  FROM (SELECT DISTINCT segment FROM grp) s
  CROSS JOIN (SELECT unnest(range(0, {_JK_G})) AS jk) j
), full_grp AS (
  SELECT grid.segment, grid.jk,
         coalesce(g.t_g, CAST(0 AS HUGEINT)) AS t_g,
         coalesce(g.n_g, 0) AS n_g
  FROM grid LEFT JOIN grp g ON grid.segment = g.segment AND grid.jk = g.jk
), tot AS (
  SELECT segment, CAST(sum(t_g) AS HUGEINT) AS t,
         CAST(sum(n_g) AS BIGINT) AS n_orders
  FROM full_grp GROUP BY segment
), dev AS (
  SELECT g.segment, t.t, t.n_orders,
         sum((t.t - {_JK_G} * g.t_g) * (t.t - {_JK_G} * g.t_g)) AS ssd
  FROM full_grp g JOIN tot t USING (segment)
  GROUP BY g.segment, t.t, t.n_orders
)
SELECT segment, n_orders,
       {R("CAST(t AS DOUBLE) / 100.0", 2)} AS total,
       {R(f"sqrt(CAST(ssd AS DOUBLE) / ({_JK_G}.0 * {_JK_G - 1}.0)) / 100.0", 2)} AS se,
       {R(f"100.0 * (sqrt(CAST(ssd AS DOUBLE) / ({_JK_G}.0 * {_JK_G - 1}.0)) / CAST(t AS DOUBLE))", 6)} AS cv_pct
FROM dev
ORDER BY segment
""",
)
def survey_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 2), 16, 10)
            .cast("long")
            % _JK_G
        ).alias("jk"),
        cents("o_totalprice").alias("vc"),
    )
    grp = base.groupBy("segment", "jk").agg(
        F.sum("vc").cast(_DEC).alias("t_g"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
    )
    # full (segment, replicate) grid: an empty delete-group is still a
    # replicate and must contribute (T - G*0)^2 to the variance
    grid = (
        grp.select("segment")
        .distinct()
        .crossJoin(
            F.broadcast(
                grp.sparkSession.range(_JK_G).select(F.col("id").alias("jk"))
            )
        )
    )
    full_grp = grid.join(grp, ["segment", "jk"], "left").select(
        "segment",
        "jk",
        F.coalesce(F.col("t_g"), F.lit(0).cast(_DEC)).alias("t_g"),
        F.coalesce(F.col("n_g"), F.lit(0)).cast("long").alias("n_g"),
    )
    tot = full_grp.groupBy("segment").agg(
        F.sum("t_g").alias("t"), F.sum("n_g").cast("long").alias("n_orders")
    )
    dev = (
        full_grp.join(F.broadcast(tot), "segment")
        .groupBy("segment", "t", "n_orders")
        .agg(
            F.sum(
                (F.col("t") - F.lit(_JK_G) * F.col("t_g"))
                * (F.col("t") - F.lit(_JK_G) * F.col("t_g"))
            ).alias("ssd")
        )
    )
    se = F.sqrt(
        F.col("ssd").cast("double") / F.lit(float(_JK_G * (_JK_G - 1)))
    )
    return dev.select(
        "segment",
        "n_orders",
        pround(F.col("t").cast("double") / F.lit(100.0), 2).alias("total"),
        pround(se / F.lit(100.0), 2).alias("se"),
        pround(F.lit(100.0) * (se / F.col("t").cast("double")), 6).alias("cv_pct"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Neyman optimal allocation: distribute a fixed sample of 1000 orders
# across nation strata proportionally to N_h·S_h (count × stddev of
# order value), with largest-remainder integerization so allocations
# sum exactly to 1000. S_h = sqrt of the exact-integer-moment variance
# (IEEE-exact), the cross-stratum Σ N_h·S_h folds in nation-sorted
# order (ANOVA precedent), and remainder ranking ties break on nation
# name. Scale: one stratum aggregate (25 rows) + driver-free window
# ranking over those 25 rows.
# ---------------------------------------------------------------------------
_NEYMAN_N = 1000


@query(
    "survey_neyman_allocation",
    oracle=f"""
WITH strat AS (
  SELECT n.n_name AS nation,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum({sql_cents("o.o_totalprice")}) AS HUGEINT) AS s,
         CAST(sum(CAST({sql_cents("o.o_totalprice")} AS HUGEINT)
                  * {sql_cents("o.o_totalprice")}) AS HUGEINT) AS q
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
), wts AS (
  SELECT nation, n_h,
         CAST(n_h AS DOUBLE)
           * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n_h AS DOUBLE)) / CAST(n_h AS DOUBLE)) AS w
  FROM strat
), tot AS (
  SELECT list_reduce(list(w ORDER BY nation), (a, b) -> a + b) AS w_all FROM wts
), shares AS (
  SELECT nation, n_h, w, {_NEYMAN_N}.0 * w / w_all AS exact_alloc
  FROM wts CROSS JOIN tot
), base AS (
  SELECT nation, n_h, exact_alloc,
         CAST(floor(exact_alloc) AS BIGINT) AS floor_alloc,
         exact_alloc - floor(exact_alloc) AS rem
  FROM shares
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, nation) AS rnk,
         CAST({_NEYMAN_N} - sum(floor_alloc) OVER () AS BIGINT) AS short
  FROM base
)
SELECT nation, n_h,
       CAST(floor_alloc + CASE WHEN rnk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc,
       {R("exact_alloc", 4)} AS exact_alloc
FROM ranked
ORDER BY nation
""",
)
def survey_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vc = cents("o_totalprice")
    strat = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum(vc).cast(_DEC).alias("s"),
            F.sum((vc * vc).cast(_DEC)).alias("q"),
        )
    )
    w = (
        F.col("n_h").cast("double")
        * F.sqrt(
            (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n_h").cast("double")
            )
            / F.col("n_h").cast("double")
        )
    ).alias("w")
    wts = strat.select("nation", "n_h", w)
    tot = wts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("nation"), F.col("w")))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("w_all")
    )
    shares = wts.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n_h",
        (F.lit(float(_NEYMAN_N)) * F.col("w") / F.col("w_all")).alias("exact_alloc"),
    )
    base = shares.select(
        "nation",
        "n_h",
        "exact_alloc",
        F.floor("exact_alloc").cast("long").alias("floor_alloc"),
        (F.col("exact_alloc") - F.floor("exact_alloc")).alias("rem"),
    )
    wr = W.orderBy(F.desc("rem"), "nation")
    ranked = base.select(
        "*",
        F.row_number().over(wr).alias("rnk"),
        (F.lit(_NEYMAN_N) - F.sum("floor_alloc").over(W.partitionBy())).cast(
            "long"
        ).alias("short"),
    )
    return ranked.select(
        "nation",
        "n_h",
        (
            F.col("floor_alloc")
            + F.when(F.col("rnk") <= F.col("short"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        pround(F.col("exact_alloc"), 4).alias("exact_alloc"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Atkinson inequality index (ε = 2) of customer spend by nation:
# A₂ = 1 − HM/mean, the harmonic-over-arithmetic-mean form. No
# math-library log/exp anywhere: 1/x over integer cents is the EXACT
# integer quotient 10^15 div x (floor division is deterministic in
# both engines), so Σ 1/x is an exact integer sum and the index is
# two final divisions. Scale: customer-spend rollup then one
# per-nation aggregate.
# ---------------------------------------------------------------------------
_INV_SCALE = 10**15


@query(
    "atkinson_inequality_by_nation",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey, CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
), tagged AS (
  SELECT n.n_name AS nation, s.x, {_INV_SCALE} // s.x AS inv
  FROM spend s
  JOIN customer c ON s.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE s.x > 0
), agg AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(inv) AS HUGEINT) AS sinv
  FROM tagged GROUP BY nation
)
SELECT nation, n_cust,
       {R("CAST(sx AS DOUBLE) / CAST(n_cust AS DOUBLE) / 100.0", 2)} AS mean_spend,
       {R(
           f"1.0 - (CAST(n_cust AS DOUBLE) * CAST(n_cust AS DOUBLE) * {float(_INV_SCALE)!r}"
           " / CAST(sinv AS DOUBLE)) / CAST(sx AS DOUBLE)",
           6,
       )} AS atkinson2
FROM agg
ORDER BY nation
""",
)
def atkinson_inequality_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast("long").alias("x")
    )
    tagged = (
        spend.filter(F.col("x") > 0)
        .join(F.broadcast(cust), spend.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "x",
            F.expr(f"{_INV_SCALE} div x").alias("inv"),
        )
    )
    agg = tagged.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("inv").cast(_DEC).alias("sinv"),
    )
    n_d = F.col("n_cust").cast("double")
    hm_cents = n_d * n_d * F.lit(float(_INV_SCALE)) / F.col("sinv").cast("double")
    return agg.select(
        "nation",
        "n_cust",
        pround(F.col("sx").cast("double") / n_d / F.lit(100.0), 2).alias("mean_spend"),
        pround(F.lit(1.0) - hm_cents / F.col("sx").cast("double"), 6).alias(
            "atkinson2"
        ),
    ).orderBy("nation")
