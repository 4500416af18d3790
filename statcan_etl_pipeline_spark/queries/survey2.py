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
# Scale: one groupBy(v, g), one groupBy(v), then the HOUSE two-pass
# bucketed prefix sum (stats._cum_two_group — the KS/MWU machinery)
# for the cumulative-before counts: no partition-less window ever
# touches the distinct-value set, only the 256-row bucket aggregate.
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
    from .stats import _cum_two_group

    vt2 = _cum_two_group(
        vt.select("v", F.col("t").alias("c1"), F.lit(0).cast("long").alias("c2"))
    ).select(
        "v",
        F.col("c1").alias("t"),
        (F.col("cum1") - F.col("c1")).cast("long").alias("cb"),
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
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
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
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
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
        orders.join(cust, orders.o_custkey == cust.c_custkey)
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
        .join(cust, spend.o_custkey == cust.c_custkey)
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


# ---------------------------------------------------------------------------
# Chain-ladder completion (the actuarial development-triangle method
# statistics agencies use to NOWCAST totals while late records are
# still arriving): lineitem shipments are laid out as an (order-month
# origin × ship-delay development) triangle, volume-weighted
# development factors f_d = Σ C(o,d+1) / Σ C(o,d) are estimated over
# the origins old enough to have reached d+1, and each immature
# origin's ultimate count is its latest diagonal times the product of
# the remaining factors. All triangle cells are exact integers; each
# factor is one division of exact sums; the factor product is a
# d-sorted fold (identical order both engines — the EWMA precedent).
# Scale: the triangle is bounded (months × 5 cells) no matter how many
# fact rows feed it — one fact-table aggregation, then cell-table math.
# ---------------------------------------------------------------------------
_CL_MAXDEV = 4


@query(
    "orders_chain_ladder_completion",
    oracle=f"""
WITH pairs AS (
  SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS om,
         (year(l.l_shipdate) * 12 + month(l.l_shipdate)) AS sm
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE (year(l.l_shipdate) * 12 + month(l.l_shipdate))
        >= (year(o.o_orderdate) * 12 + month(o.o_orderdate))
), lim AS (
  SELECT max(sm) AS m FROM pairs
), tri AS (
  SELECT om, least(sm - om, {_CL_MAXDEV}) AS dev, CAST(count(*) AS BIGINT) AS inc
  FROM pairs GROUP BY om, least(sm - om, {_CL_MAXDEV})
), oms AS (
  SELECT DISTINCT om FROM tri
), grid AS (
  SELECT o.om, d.dev
  FROM oms o CROSS JOIN (SELECT unnest(range(0, {_CL_MAXDEV + 1})) AS dev) d
), cum AS (
  SELECT g.om, g.dev,
         CAST(sum(coalesce(t.inc, 0)) OVER (PARTITION BY g.om ORDER BY g.dev
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM grid g LEFT JOIN tri t ON g.om = t.om AND g.dev = t.dev
), maxdev AS (
  SELECT o.om, least(lim.m - o.om, {_CL_MAXDEV}) AS md FROM oms o CROSS JOIN lim
), fac AS (
  SELECT cd.dev AS d, CAST(sum(cn.c) AS BIGINT) AS num,
         CAST(sum(cd.c) AS BIGINT) AS den
  FROM cum cd
  JOIN cum cn ON cn.om = cd.om AND cn.dev = cd.dev + 1
  JOIN maxdev md ON md.om = cd.om
  WHERE cd.dev <= {_CL_MAXDEV - 1} AND md.md >= cd.dev + 1
  GROUP BY cd.dev
), fl AS (
  SELECT list(struct_pack(d := s.dev,
           f := CASE WHEN coalesce(fac.den, 0) > 0
                THEN CAST(fac.num AS DOUBLE) / CAST(fac.den AS DOUBLE)
                ELSE 1.0 END) ORDER BY s.dev) AS facs
  FROM (SELECT unnest(range(0, {_CL_MAXDEV})) AS dev) s
  LEFT JOIN fac ON fac.d = s.dev
), base AS (
  SELECT md.om, md.md, c.c AS observed,
         CAST(c.c AS DOUBLE) * list_reduce(
           list_concat([CAST(1.0 AS DOUBLE)],
             list_transform(list_filter(fl.facs, x -> x.d >= md.md), x -> x.f)),
           (a, b) -> a * b) AS ult
  FROM maxdev md
  JOIN cum c ON c.om = md.om AND c.dev = md.md
  CROSS JOIN fl
)
SELECT CAST((om - 1) // 12 AS BIGINT) || '-' ||
         lpad(CAST(om - 12 * ((om - 1) // 12) AS VARCHAR), 2, '0') AS origin_month,
       CAST(md AS BIGINT) AS max_dev, observed,
       {R("ult", 2)} AS ultimate,
       {R("100.0 * CAST(observed AS DOUBLE) / ult", 4)} AS completion_pct
FROM base
ORDER BY origin_month
""",
)
def orders_chain_ladder_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    om = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("om")
    sm = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("sm")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(om, sm)
        .filter(F.col("sm") >= F.col("om"))
    )
    lim = pairs.agg(F.max("sm").alias("m"))
    tri = pairs.groupBy(
        "om", F.least(F.col("sm") - F.col("om"), F.lit(_CL_MAXDEV)).alias("dev")
    ).agg(F.count(F.lit(1)).cast("long").alias("inc"))
    oms = tri.select("om").distinct()
    spine = oms.sparkSession.range(_CL_MAXDEV + 1).select(F.col("id").alias("dev"))
    grid = oms.crossJoin(F.broadcast(spine))
    wc = (
        W.partitionBy("om").orderBy("dev").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        grid.join(tri, ["om", "dev"], "left")
        .select("om", "dev", F.coalesce("inc", F.lit(0)).alias("inc"))
        .select("om", "dev", F.sum("inc").over(wc).cast("long").alias("c"))
    )
    maxdev = oms.crossJoin(F.broadcast(lim)).select(
        "om", F.least(F.col("m") - F.col("om"), F.lit(_CL_MAXDEV)).alias("md")
    )
    cd = cum.alias("cd")
    cn = cum.select(
        F.col("om").alias("om2"), (F.col("dev") - 1).alias("dev2"), F.col("c").alias("c_next")
    )
    fac = (
        cd.join(cn, (F.col("cd.om") == F.col("om2")) & (F.col("cd.dev") == F.col("dev2")))
        .join(maxdev, F.col("cd.om") == maxdev.om)
        .filter(
            (F.col("cd.dev") <= _CL_MAXDEV - 1) & (F.col("md") >= F.col("cd.dev") + 1)
        )
        .groupBy(F.col("cd.dev").alias("d"))
        .agg(
            F.sum("c_next").cast("long").alias("num"),
            F.sum(F.col("cd.c")).cast("long").alias("den"),
        )
    )
    fspine = oms.sparkSession.range(_CL_MAXDEV).select(F.col("id").alias("d"))
    f_col = F.when(
        F.coalesce(F.col("den"), F.lit(0)) > 0,
        F.col("num").cast("double") / F.col("den").cast("double"),
    ).otherwise(F.lit(1.0))
    fl = (
        fspine.join(fac, "d", "left")
        .select("d", f_col.alias("f"))
        .agg(F.array_sort(F.collect_list(F.struct("d", "f"))).alias("facs"))
    )
    base = (
        maxdev.join(
            cum, (maxdev.om == cum.om) & (maxdev.md == cum.dev)
        )
        .select(maxdev.om.alias("o_m"), "md", F.col("c").alias("observed"))
        .crossJoin(F.broadcast(fl))
    )
    ult = F.col("observed").cast("double") * F.aggregate(
        F.filter(F.col("facs"), lambda x: x["d"] >= F.col("md")),
        F.lit(1.0),
        lambda acc, x: acc * x["f"],
    )
    return (
        base.select(
            F.concat(
                ((F.col("o_m") - 1) / 12).cast("long").cast("string"),
                F.lit("-"),
                F.lpad(
                    (F.col("o_m") - ((F.col("o_m") - 1) / 12).cast("long") * 12)
                    .cast("string"),
                    2,
                    "0",
                ),
            ).alias("origin_month"),
            F.col("md").cast("long").alias("max_dev"),
            "observed",
            pround(ult, 2).alias("ultimate"),
            pround(
                F.lit(100.0) * F.col("observed").cast("double") / ult, 4
            ).alias("completion_pct"),
        )
        .orderBy("origin_month")
    )


# ---------------------------------------------------------------------------
# Tukey HSD post-hoc pairwise comparison (the follow-up to
# anova_order_value_by_priority): all 10 priority pairs tested with
# HSD = q · sqrt(MSW/2 · (1/n_i + 1/n_j)), q = 3.858 (studentized
# range, k = 5, df → ∞). Group moments are exact integer cents sums;
# MSW reuses the ANOVA priority-sorted fold; each pair verdict is a
# fixed scalar double sequence — engine-exact. The pair join is over
# the bounded 5-row group table.
# ---------------------------------------------------------------------------
_TUKEY_Q = 3.858


@query(
    "tukey_hsd_pairwise",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({sql_cents("o_totalprice")}) AS HUGEINT) AS s,
         CAST(sum(CAST({sql_cents("o_totalprice")} AS HUGEINT)
                  * {sql_cents("o_totalprice")}) AS HUGEINT) AS q
  FROM orders GROUP BY o_orderpriority
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n_all,
         CAST(sum(q) AS HUGEINT) AS q_all,
         list_reduce(
           list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                ORDER BY g),
           (a, b) -> a + b) AS sum_terms
  FROM g
), msw AS (
  SELECT (CAST(q_all AS DOUBLE) - sum_terms)
           / (CAST(n_all AS DOUBLE) - CAST(k AS DOUBLE)) AS w
  FROM t
), pairs AS (
  SELECT a.g AS prio_a, b.g AS prio_b,
         abs(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
             - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) AS diff_c,
         {_TUKEY_Q} * sqrt(msw.w / 2.0
           * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))) AS hsd_c
  FROM g a JOIN g b ON a.g < b.g CROSS JOIN msw
)
SELECT prio_a, prio_b,
       {R("diff_c / 100.0", 2)} AS mean_diff,
       {R("hsd_c / 100.0", 2)} AS hsd,
       diff_c > hsd_c AS significant
FROM pairs
ORDER BY prio_a, prio_b
""",
)
def tukey_hsd_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vc = cents("o_totalprice")
    g = orders.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(vc).cast(_DEC).alias("s"),
        F.sum((vc * vc).cast(_DEC)).alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_all"),
        F.sum("q").alias("q_all"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("s"), F.col("n")))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["s"].cast("double") * x["s"].cast("double") / x["n"].cast("double"),
        ).alias("sum_terms"),
    )
    msw = t.select(
        (
            (F.col("q_all").cast("double") - F.col("sum_terms"))
            / (F.col("n_all").cast("double") - F.col("k").cast("double"))
        ).alias("w")
    )
    a = g.select(
        F.col("g").alias("prio_a"), F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = g.select(
        F.col("g").alias("prio_b"), F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    diff_c = F.abs(
        F.col("s_a").cast("double") / F.col("n_a").cast("double")
        - F.col("s_b").cast("double") / F.col("n_b").cast("double")
    )
    hsd_c = F.lit(_TUKEY_Q) * F.sqrt(
        F.col("w") / F.lit(2.0)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return (
        a.join(b, F.col("prio_a") < F.col("prio_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "prio_a",
            "prio_b",
            pround(diff_c / F.lit(100.0), 2).alias("mean_diff"),
            pround(hsd_c / F.lit(100.0), 2).alias("hsd"),
            (diff_c > hsd_c).alias("significant"),
        )
        .orderBy("prio_a", "prio_b")
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival curve of order→first-shipment latency, right-
# censored at 60 days (the product-limit estimator — the standard
# duration-analysis tool; censoring makes it different from a plain
# ECDF). Event counts d(t) and at-risk counts n(t) are exact integers
# (censoring happens only at the horizon, so n(t) = N − Σ_{u<t} d(u));
# S(t) = Π_{u≤t} (1 − d/n) is computed per row by folding the ONE
# bounded (≤61-element, time-sorted) event array broadcast to every
# row — identical fold order in both engines, no running-product
# window needed. Scale: the fact table collapses to ≤61 cells before
# any per-row math.
# ---------------------------------------------------------------------------
_KM_HORIZON = 60


@query(
    "orders_kaplan_meier_ship_latency",
    oracle=f"""
WITH lag AS (
  SELECT o.o_orderkey,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(min(l.l_shipdate) AS DATE)) AS lat
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), obs AS (
  SELECT CASE WHEN lat <= {_KM_HORIZON} THEN lat ELSE {_KM_HORIZON} END AS t,
         CASE WHEN lat <= {_KM_HORIZON} THEN 1 ELSE 0 END AS ev
  FROM lag WHERE lat >= 0
), n_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM obs
), cells AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d FROM obs WHERE ev = 1 GROUP BY t
), risked AS (
  SELECT c.t, c.d,
         n_tot.n - CAST(coalesce(sum(c.d) OVER (ORDER BY c.t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM cells c CROSS JOIN n_tot
), arr AS (
  SELECT list(struct_pack(t := t, d := d, n := n_risk) ORDER BY t) AS a FROM risked
)
SELECT r.t AS t_days, r.n_risk, r.d AS d_events,
       {R(
           "list_reduce(list_concat([CAST(1.0 AS DOUBLE)],"
           " list_transform(list_filter(arr.a, x -> x.t <= r.t),"
           " x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),"
           " (p, q) -> p * q)",
           6,
       )} AS survival
FROM risked r CROSS JOIN arr
ORDER BY t_days
""",
)
def orders_kaplan_meier_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.datediff(F.min("l_shipdate"), F.first("o_orderdate")).alias("lat"))
    )
    obs = lag.filter(F.col("lat") >= 0).select(
        F.when(F.col("lat") <= _KM_HORIZON, F.col("lat"))
        .otherwise(F.lit(_KM_HORIZON))
        .alias("t"),
        F.when(F.col("lat") <= _KM_HORIZON, 1).otherwise(0).alias("ev"),
    )
    n_tot = obs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = (
        obs.filter(F.col("ev") == 1)
        .groupBy("t")
        .agg(F.sum("ev").cast("long").alias("d"))
    )
    risked = cells.crossJoin(F.broadcast(n_tot)).select(
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("d").over(W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    arr = risked.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", F.col("n_risk").alias("n")))).alias("a")
    )
    surv = F.aggregate(
        F.filter(F.col("a"), lambda x: x["t"] <= F.col("t_days")),
        F.lit(1.0),
        lambda acc, x: acc * (F.lit(1.0) - x["d"].cast("double") / x["n"].cast("double")),
    )
    return (
        risked.select(
            F.col("t").alias("t_days"), "n_risk", F.col("d").alias("d_events")
        )
        .crossJoin(F.broadcast(arr))
        .select("t_days", "n_risk", "d_events", pround(surv, 6).alias("survival"))
        .orderBy("t_days")
    )


# ---------------------------------------------------------------------------
# Generalized variance function (GVF) fit — the survey-methods tool
# that SMOOTHS unstable per-cell variance estimates by modeling the
# relative variance of each (nation × segment) total as
# relvar = a + b / x̂ and publishing CVs off the fitted curve instead
# of the noisy direct estimates. Portability: per-cell relvar is
# pico-quantized (1e-12) and 1/x̂ is the EXACT integer 10¹⁵ div cents,
# so the OLS normal equations are exact DECIMAL/HUGEINT sums; a, b,
# r² are a fixed scalar-double sequence at the end. Scale: the fact
# table collapses to ≤125 cells before the regression.
# ---------------------------------------------------------------------------
@query(
    "statcan_gvf_cv_model",
    oracle=f"""
WITH cells AS (
  SELECT n.n_name AS nation, c.c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({sql_cents("o.o_totalprice")}) AS HUGEINT) AS s,
         CAST(sum(CAST({sql_cents("o.o_totalprice")} AS HUGEINT)
                  * {sql_cents("o.o_totalprice")}) AS HUGEINT) AS q
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_mktsegment
  HAVING count(*) >= 2
), pts AS (
  SELECT CAST(1000000000000000 // s AS BIGINT) AS u,
         CAST(floor(
           ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
           / (CAST(n AS DOUBLE)
              * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           * 1000000000000.0 + 0.5) AS BIGINT) AS v
  FROM cells
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(u) AS HUGEINT) AS su, CAST(sum(v) AS HUGEINT) AS sv,
         CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS suv,
         CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu,
         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv
  FROM pts
), fit AS (
  SELECT m,
         (CAST(m AS DOUBLE) * CAST(suv AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE)) AS covn,
         (CAST(m AS DOUBLE) * CAST(suu AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) AS varu,
         (CAST(m AS DOUBLE) * CAST(svv AS DOUBLE)
          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) AS varv,
         CAST(su AS DOUBLE) AS sud, CAST(sv AS DOUBLE) AS svd
  FROM mom
)
SELECT m AS n_cells,
       {R("(svd * 1e-12 - (covn / varu) * 1000.0 * (sud * 1e-15)) / CAST(m AS DOUBLE)", 8)} AS a,
       {R("(covn / varu) * 1000.0", 2)} AS b,
       {R("covn * covn / (varu * varv)", 6)} AS r2
FROM fit
""",
)
def statcan_gvf_cv_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vc = cents("o_totalprice")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vc).cast(_DEC).alias("s"),
            F.sum((vc * vc).cast(_DEC)).alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    var = (F.col("q").cast("double") - s_d * s_d / n_d) / (n_d - F.lit(1.0))
    relvar = var / (n_d * (s_d / n_d) * (s_d / n_d))
    pts = cells.select(
        F.expr("CAST(1000000000000000 div CAST(s AS BIGINT) AS BIGINT)").alias("u"),
        F.floor(relvar * F.lit(1000000000000.0) + F.lit(0.5)).cast("long").alias("v"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("u").cast(_DEC).alias("su"),
        F.sum("v").cast(_DEC).alias("sv"),
        F.sum(F.col("u").cast(_DEC) * F.col("v").cast(_DEC)).alias("suv"),
        F.sum(F.col("u").cast(_DEC) * F.col("u").cast(_DEC)).alias("suu"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias("svv"),
    )
    m_d = F.col("m").cast("double")
    covn = m_d * F.col("suv").cast("double") - F.col("su").cast("double") * F.col("sv").cast("double")
    varu = m_d * F.col("suu").cast("double") - F.col("su").cast("double") * F.col("su").cast("double")
    varv = m_d * F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv").cast("double")
    b = (covn / varu) * F.lit(1000.0)
    return mom.select(
        F.col("m").alias("n_cells"),
        pround(
            (
                F.col("sv").cast("double") * F.lit(1e-12)
                - (covn / varu) * F.lit(1000.0) * (F.col("su").cast("double") * F.lit(1e-15))
            )
            / m_d,
            8,
        ).alias("a"),
        pround(b, 2).alias("b"),
        pround(covn * covn / (varu * varv), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Random rounding to base 5 (RR5) — StatCan's standard disclosure-
# control treatment for frequency tables (census/NHS publication
# rule): every cell count is rounded to a multiple of 5, rounding UP
# with probability r/5 where r = count mod 5. This implementation
# derandomizes the coin with an md5 hash of the cell key (reproducible
# releases, engine-portable — the jackknife/raking digest precedent):
# up iff md5(cell) mod 5 < r, which preserves the r/5 up-rate across
# cells. Pure integer arithmetic; the per-nation audit shows the net
# bias the rounding introduces. Pytest pins every published cell ≡ 0
# (mod 5) and |cell bias| < 5.
# ---------------------------------------------------------------------------
@query(
    "statcan_random_rounding_base5",
    oracle="""
WITH cells AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, o.o_orderpriority
), coins AS (
  SELECT nation, priority, c, c % 5 AS r,
         CAST(CAST('0x' || substr(md5(nation || '|' || priority), 1, 2)
              AS INTEGER) % 5 AS BIGINT) AS coin
  FROM cells
), rounded AS (
  SELECT nation, c,
         CASE WHEN r = 0 THEN c
              WHEN coin < r THEN c - r + 5
              ELSE c - r END AS pub
  FROM coins
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(c) AS BIGINT) AS raw_total,
       CAST(sum(pub) AS BIGINT) AS published_total,
       CAST(sum(pub) - sum(c) AS BIGINT) AS net_bias,
       CAST(sum(CASE WHEN pub > c THEN 1 ELSE 0 END) AS BIGINT) AS n_rounded_up
FROM rounded
GROUP BY nation
ORDER BY nation
""",
)
def statcan_random_rounding_base5(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    coins = cells.select(
        "nation",
        "c",
        (F.col("c") % 5).alias("r"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", "nation", "priority")), 1, 2
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("coin"),
    )
    rounded = coins.select(
        "nation",
        "c",
        F.when(F.col("r") == 0, F.col("c"))
        .when(F.col("coin") < F.col("r"), F.col("c") - F.col("r") + 5)
        .otherwise(F.col("c") - F.col("r"))
        .alias("pub"),
    )
    return (
        rounded.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c").cast("long").alias("raw_total"),
            F.sum("pub").cast("long").alias("published_total"),
            (F.sum("pub") - F.sum("c")).cast("long").alias("net_bias"),
            F.sum(F.when(F.col("pub") > F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("n_rounded_up"),
        )
        .orderBy("nation")
    )
