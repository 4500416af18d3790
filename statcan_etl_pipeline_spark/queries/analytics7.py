"""Round-6 batch 3: statistical-disclosure control, CV quality grades,
calendarization, PMI collocations, business-day latency, CUSUM drift,
and daily autocorrelation.

House rules as everywhere: exact integer arithmetic before any
division (moment sums in int64 or DECIMAL(38,0)/HUGEINT), pround /
sql_round twins for doubles, deterministic tie-breaks, windows and
sequential folds only over bounded aggregates (never the raw fact
table), dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..functions.text import norm_text, sql_norm_text, tokens
from ..registry import query

# ---------------------------------------------------------------------------
# Statistical disclosure control (the StatCan confidentiality pass):
# publishable cells = (part brand? no — nation × ship-year at the
# detailed part level) — here (p_partkey is too fine for a summary, so
# the cell is (nation, year, part-brand)): a cell is SUPPRESSED when it
# has fewer than 3 contributing suppliers (count rule) or when the top
# contributor exceeds 75% of the cell total (p=75 dominance rule). Both
# rules are exact integer tests (4·max > 3·total — no float compare at
# the boundary). The output is the per-year suppression census + the
# publishable total, so the result stays bounded while every cell is
# classified. Two partial-aggregatable shuffles: per-(cell, supplier)
# cents, then per-cell count/sum/max; the census is a third, tiny one.
# ---------------------------------------------------------------------------


@query(
    "statcan_cell_suppression",
    oracle="""
WITH per_supp AS (
  SELECT n.n_name AS nation, year(l.l_shipdate) AS yr, p.p_brand AS brand,
         l.l_suppkey AS suppkey,
         sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY n.n_name, year(l.l_shipdate), p.p_brand, l.l_suppkey
), cell AS (
  SELECT nation, yr, brand,
         count(*) AS n_contrib, sum(c) AS tot, max(c) AS mx
  FROM per_supp GROUP BY nation, yr, brand
), flagged AS (
  SELECT yr,
         CASE WHEN n_contrib < 3 THEN 'suppressed_count'
              WHEN 4 * mx > 3 * tot THEN 'suppressed_dominance'
              ELSE 'ok' END AS status,
         tot
  FROM cell
)
SELECT CAST(yr AS BIGINT) AS yr,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(sum(CASE WHEN status = 'suppressed_count' THEN 1 ELSE 0 END) AS BIGINT) AS n_supp_count,
       CAST(sum(CASE WHEN status = 'suppressed_dominance' THEN 1 ELSE 0 END) AS BIGINT) AS n_supp_dominance,
       CAST(sum(CASE WHEN status = 'ok' THEN tot ELSE 0 END) AS DOUBLE) / 100.0 AS published_value
FROM flagged
GROUP BY yr
ORDER BY yr
""",
)
def statcan_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    pa = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    per_supp = (
        li.join(F.broadcast(su.select("s_suppkey", "s_nationkey")), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na.select("n_nationkey", "n_name")), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(pa.select("p_partkey", "p_brand")), li.l_partkey == pa.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("yr"),
            F.col("p_brand").alias("brand"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(cents).alias("c"))
    )
    cell = per_supp.groupBy("nation", "yr", "brand").agg(
        F.count(F.lit(1)).alias("n_contrib"),
        F.sum("c").alias("tot"),
        F.max("c").alias("mx"),
    )
    status = (
        F.when(F.col("n_contrib") < 3, "suppressed_count")
        .when(4 * F.col("mx") > 3 * F.col("tot"), "suppressed_dominance")
        .otherwise("ok")
    )
    flagged = cell.select("yr", status.alias("status"), "tot")
    return (
        flagged.groupBy(F.col("yr").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0))
            .cast("long")
            .alias("n_ok"),
            F.sum(F.when(F.col("status") == "suppressed_count", 1).otherwise(0))
            .cast("long")
            .alias("n_supp_count"),
            F.sum(F.when(F.col("status") == "suppressed_dominance", 1).otherwise(0))
            .cast("long")
            .alias("n_supp_dominance"),
            (
                F.sum(F.when(F.col("status") == "ok", F.col("tot")).otherwise(0)).cast(
                    "double"
                )
                / 100.0
            ).alias("published_value"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# CV quality grades (the StatCan release-quality letter): coefficient
# of variation of each nation's YEARLY export revenue across years,
# graded A (cv ≤ 5%) … F (cv > 35%). Moment sums are exact — yearly
# cents in int64, squares in DECIMAL(38,0)/HUGEINT — and every grade
# boundary is an exact integer cross-multiplication
# (10000·(n·s2 − s1²) ≤ thr²·s1²), so a cell can never change letter
# because of float noise. cv itself is sqrt(exact)/exact with one
# division. Yearly series are bounded (≤ #years rows per nation), so
# the second aggregate is tiny.
# ---------------------------------------------------------------------------


@query(
    "statcan_cv_quality_grades",
    oracle=f"""
WITH yearly AS (
  SELECT n.n_name AS nation, year(l.l_shipdate) AS yr,
         sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, year(l.l_shipdate)
), mo AS (
  SELECT nation, count(*) AS n, sum(c) AS s1,
         sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
  FROM yearly GROUP BY nation
), cvn AS (
  SELECT nation, n, s1, n * s2 - s1 * s1 AS num FROM mo
)
SELECT nation, CAST(n AS BIGINT) AS n_years,
       {R("sqrt(CAST(num AS DOUBLE)) / CAST(s1 AS DOUBLE)", 6)} AS cv,
       CASE WHEN 10000 * num <= 25 * s1 * s1 THEN 'A'
            WHEN 10000 * num <= 100 * s1 * s1 THEN 'B'
            WHEN 10000 * num <= 225 * s1 * s1 THEN 'C'
            WHEN 10000 * num <= 625 * s1 * s1 THEN 'D'
            WHEN 10000 * num <= 1225 * s1 * s1 THEN 'E'
            ELSE 'F' END AS grade
FROM cvn
ORDER BY nation
""",
)
def statcan_cv_quality_grades(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    yearly = (
        li.join(F.broadcast(su.select("s_suppkey", "s_nationkey")), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na.select("n_nationkey", "n_name")), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("yr"))
        .agg(F.sum(cents).alias("c"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — overflow-proof sums
    mo = yearly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(dec(F.col("c")) * dec(F.col("c"))).alias("s2"),
    )
    num = dec(F.col("n")) * F.col("s2") - dec(F.col("s1")) * dec(F.col("s1"))
    s1sq = dec(F.col("s1")) * dec(F.col("s1"))
    cvn = mo.select("nation", "n", "s1", num.alias("num"), s1sq.alias("s1sq"))
    grade = (
        F.when(10000 * F.col("num") <= 25 * F.col("s1sq"), "A")
        .when(10000 * F.col("num") <= 100 * F.col("s1sq"), "B")
        .when(10000 * F.col("num") <= 225 * F.col("s1sq"), "C")
        .when(10000 * F.col("num") <= 625 * F.col("s1sq"), "D")
        .when(10000 * F.col("num") <= 1225 * F.col("s1sq"), "E")
        .otherwise("F")
    )
    return cvn.select(
        "nation",
        F.col("n").cast("long").alias("n_years"),
        pround(
            F.sqrt(F.col("num").cast("double")) / F.col("s1").cast("double"), 6
        ).alias("cv"),
        grade.alias("grade"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Calendarization (temporal disaggregation): each order's value is
# prorated uniformly across its open interval [order date, last ship
# date] and re-aggregated onto the calendar month — the StatCan
# technique for converting activity spans into monthly estimates. The
# per-(order, month) allocation rounds ONCE with the portable
# floor(x + 0.5) (integer cents × overlap days fits a double exactly;
# the single division is correctly rounded), then sums exactly in
# int64, so both engines agree bit-for-bit. Month fan-out per order is
# bounded by the ship latency (a handful of rows), never a calendar
# cross join.
# ---------------------------------------------------------------------------


@query(
    "statcan_calendarization",
    oracle="""
WITH spans AS (
  -- the synthetic data contains ship dates BEFORE the order date, so
  -- the activity interval is normalized to [least, greatest] (mirrored
  -- on the Spark side)
  SELECT o.o_orderkey,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
         least(CAST(o.o_orderdate AS DATE), CAST(max(l.l_shipdate) AS DATE)) AS a,
         greatest(CAST(o.o_orderdate AS DATE), CAST(max(l.l_shipdate) AS DATE)) AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
), exploded AS (
  SELECT o_orderkey, c, a, b,
         date_diff('day', a, b) + 1 AS span,
         CAST(unnest(generate_series(date_trunc('month', a),
                                     date_trunc('month', b),
                                     INTERVAL 1 MONTH)) AS DATE) AS m
  FROM spans
), alloc AS (
  SELECT strftime(m, '%Y-%m') AS month, o_orderkey,
         CAST(floor(CAST(c * (date_diff('day', greatest(m, a),
                                        least(last_day(m), b)) + 1) AS DOUBLE)
                    / span + 0.5) AS BIGINT) AS alloc_c
  FROM exploded
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(alloc_c) AS DOUBLE) / 100.0 AS cal_value
FROM alloc
GROUP BY month
ORDER BY month
""",
)
def statcan_calendarization(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("c"),
            F.to_date("o_orderdate").alias("od"),
        )
        .agg(F.max(F.to_date("l_shipdate")).alias("sd"))
        # ship dates can precede the order date in the synthetic data:
        # normalize the activity interval to [least, greatest]
        .select(
            "o_orderkey",
            "c",
            F.least("od", "sd").alias("a"),
            F.greatest("od", "sd").alias("b"),
        )
    )
    exploded = spans.select(
        "o_orderkey",
        "c",
        "a",
        "b",
        (F.datediff("b", "a") + 1).alias("span"),
        F.explode(
            F.sequence(F.trunc("a", "MM"), F.trunc("b", "MM"), F.expr("interval 1 month"))
        ).alias("m"),
    )
    overlap = (
        F.datediff(F.least(F.last_day("m"), F.col("b")), F.greatest(F.col("m"), F.col("a")))
        + 1
    )
    alloc = exploded.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "o_orderkey",
        F.floor((F.col("c") * overlap).cast("double") / F.col("span") + 0.5)
        .cast("long")
        .alias("alloc_c"),
    )
    return (
        alloc.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum("alloc_c").cast("double") / 100.0).alias("cal_value"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# PMI collocations: the top word bigrams by pointwise-mutual-
# information LIFT = P(xy) / (P(x)·P(y)) = c_xy·T² / (B·c_x·c_y) —
# linear lift instead of log-PMI so the score is a ratio of exact
# integer products (the same no-transcendental trick as tfidf's linear
# idf). The min-support filter (c_xy ≥ 10) runs BEFORE the unigram
# joins, so at corpus scale the join left side is the small filtered
# bigram vocabulary, never the token stream; totals attach via a
# broadcast 1-row aggregate. Both engines evaluate the identical
# double expression left-to-right → bit-identical scores.
# At 100-TB corpus scale c_xy·T² can exceed int64 — both sides compute
# in DOUBLE after exact integer counts, which is the standard PMI
# contract (counts exact, score a ratio).
# ---------------------------------------------------------------------------


@query(
    "ngram_pmi_collocations",
    oracle=f"""
WITH base AS (
  SELECT string_split({sql_norm_text('text')}, ' ') AS toks FROM documents
), uni AS (
  SELECT unnest(toks) AS w FROM base
), uc AS (
  SELECT w, count(*) AS cx FROM uni GROUP BY w
), tot AS (
  SELECT sum(cx) AS t FROM uc
), bi AS (
  SELECT unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS z
  FROM base WHERE len(toks) >= 2
), bc AS (
  SELECT z[1] AS w1, z[2] AS w2, count(*) AS cxy
  FROM bi GROUP BY 1, 2
), btot AS (
  SELECT sum(cxy) AS b FROM bc
), filtered AS (
  SELECT w1, w2, cxy FROM bc WHERE cxy >= 10
), scored AS (
  SELECT f.w1 || ' ' || f.w2 AS bigram, f.cxy AS n_xy,
         {R("CAST(f.cxy AS DOUBLE) * t * t / (CAST(b AS DOUBLE) * u1.cx * u2.cx)", 4)} AS lift
  FROM filtered f
  JOIN uc u1 ON u1.w = f.w1
  JOIN uc u2 ON u2.w = f.w2
  CROSS JOIN tot CROSS JOIN btot
)
SELECT bigram, CAST(n_xy AS BIGINT) AS n_xy, lift
FROM scored
ORDER BY lift DESC, bigram
LIMIT 25
""",
)
def ngram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(norm_text("text").alias("norm")).select(
        tokens("norm").alias("toks")
    )
    uc = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cx"))
    )
    tot = uc.agg(F.sum("cx").alias("t"))
    bi = base.filter(F.size("toks") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("z")
    )
    bc = bi.groupBy(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2")).agg(
        F.count(F.lit(1)).alias("cxy")
    )
    btot = bc.agg(F.sum("cxy").alias("b"))
    filtered = bc.filter(F.col("cxy") >= 10)
    scored = (
        filtered.join(uc.withColumnRenamed("w", "w1").withColumnRenamed("cx", "cx1"), "w1")
        .join(uc.withColumnRenamed("w", "w2").withColumnRenamed("cx", "cx2"), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("cxy").cast("long").alias("n_xy"),
            pround(
                F.col("cxy").cast("double")
                * F.col("t")
                * F.col("t")
                / (F.col("b").cast("double") * F.col("cx1") * F.col("cx2")),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "bigram").limit(25)


# ---------------------------------------------------------------------------
# Business-day ship latency: weekdays in (order date, ship date] per
# priority, from the closed-form weekend count
#   weekends(a, b] = ⌊(eb−2)/7⌋ + ⌊(eb−3)/7⌋ − ⌊(ea−2)/7⌋ − ⌊(ea−3)/7⌋
# on epoch-day ordinals (1970-01-01 = Thursday ⇒ Saturdays ≡ 2 and
# Sundays ≡ 3 mod 7) — pure integer date math, no calendar explode, no
# day-spine join. Per-priority stats are exact integer sums with one
# final division; the ≤10-business-day share is an exact count ratio.
# ---------------------------------------------------------------------------

_BD_SQL = (
    "( (eb - ea) - (CAST(floor((eb - 2) / 7.0) AS BIGINT) + CAST(floor((eb - 3) / 7.0) AS BIGINT)"
    " - CAST(floor((ea - 2) / 7.0) AS BIGINT) - CAST(floor((ea - 3) / 7.0) AS BIGINT)) )"
)


@query(
    "business_day_ship_latency",
    oracle=f"""
WITH pairs AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS ea,
         date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)) AS eb
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
), bd AS (
  SELECT priority, {_BD_SQL} AS bus FROM pairs
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_shipments,
       {R("CAST(sum(bus) AS DOUBLE) / count(*)", 4)} AS avg_business_days,
       CAST(max(bus) AS BIGINT) AS max_business_days,
       {R("CAST(sum(CASE WHEN bus <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS within_10bd_share
FROM bd
GROUP BY priority
ORDER BY priority
""",
)
def business_day_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    epoch = F.to_date(F.lit("1970-01-01"))
    pairs = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.to_date("l_shipdate") >= F.to_date("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.to_date("o_orderdate"), epoch).alias("ea"),
            F.datediff(F.to_date("l_shipdate"), epoch).alias("eb"),
        )
    )
    wk = (
        F.floor((F.col("eb") - 2) / 7.0).cast("long")
        + F.floor((F.col("eb") - 3) / 7.0).cast("long")
        - F.floor((F.col("ea") - 2) / 7.0).cast("long")
        - F.floor((F.col("ea") - 3) / 7.0).cast("long")
    )
    bd = pairs.select("priority", ((F.col("eb") - F.col("ea")) - wk).alias("bus"))
    return (
        bd.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shipments"),
            pround(F.sum("bus").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_business_days"
            ),
            F.max("bus").cast("long").alias("max_business_days"),
            pround(
                F.sum(F.when(F.col("bus") <= 10, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("within_10bd_share"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection on the daily event count — the sequential
# change-point statistic streaming monitors run. Deviations are
# mean-centered WITHOUT division by scaling through n: dev_t = n·x_t −
# total (exact integers), and the two one-sided statistics fold as
#   S⁺_t = max(0, S⁺_{t−1} + dev_t),  S⁻_t = max(0, S⁻_{t−1} − dev_t).
# Like events_ewma_daily, both engines run the SAME fold in the SAME
# order — Spark as an `aggregate` HOF over the array_sort'ed daily
# series (bounded: one element per calendar day), DuckDB as a
# recursive CTE — and the state is all-integer, so results are exact,
# not merely bit-identical-by-luck. Drift flags when either side
# exceeds 2·total (a sustained shift of ~2 mean-days, scale-free).
# ---------------------------------------------------------------------------

_CUSUM_SPARK = """
aggregate(
  a,
  named_struct('u', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT),
               'out', CAST(array() AS ARRAY<STRUCT<day: DATE, x: BIGINT, u: BIGINT, d: BIGINT>>)),
  (acc, e) -> named_struct(
      'u', greatest(CAST(0 AS BIGINT), acc.u + (n * e.x - t)),
      'd', greatest(CAST(0 AS BIGINT), acc.d - (n * e.x - t)),
      'out', array_append(acc.out, named_struct(
          'day', e.day, 'x', e.x,
          'u', greatest(CAST(0 AS BIGINT), acc.u + (n * e.x - t)),
          'd', greatest(CAST(0 AS BIGINT), acc.d - (n * e.x - t))))),
  acc -> acc.out)
"""


@query(
    "events_cusum_drift",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t FROM daily
), idx AS (
  SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
), c AS (
  SELECT rn, day, x,
         greatest(CAST(0 AS BIGINT), n * x - t) AS u,
         greatest(CAST(0 AS BIGINT), t - n * x) AS d
  FROM idx, tot WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.day, i.x,
         greatest(CAST(0 AS BIGINT), c.u + (tot.n * i.x - tot.t)),
         greatest(CAST(0 AS BIGINT), c.d - (tot.n * i.x - tot.t))
  FROM c JOIN idx i ON i.rn = c.rn + 1, tot
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(x AS BIGINT) AS daily_n,
       CAST(u AS BIGINT) AS cusum_up,
       CAST(d AS BIGINT) AS cusum_down,
       (u > 2 * (SELECT t FROM tot) OR d > 2 * (SELECT t FROM tot)) AS drift_flag
FROM c
ORDER BY day
""",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    packed = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
    )
    return (
        packed.select(
            F.explode(F.expr(_CUSUM_SPARK)).alias("s"), F.col("t").alias("t")
        )
        .select(
            F.date_format(F.col("s.day"), "yyyy-MM-dd").alias("day"),
            F.col("s.x").alias("daily_n"),
            F.col("s.u").alias("cusum_up"),
            F.col("s.d").alias("cusum_down"),
            ((F.col("s.u") > 2 * F.col("t")) | (F.col("s.d") > 2 * F.col("t"))).alias(
                "drift_flag"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Daily-count autocorrelation at lags 1/2/7/14 — the seasonality
# detector run before fitting any periodic model. Pairs align by
# CALENDAR join (day + lag = day', an equi-join on the bounded daily
# aggregate), not row offsets, so missing days can't shift the lag.
# Pearson r from exact int64 moment sums; the zero-variance guard is
# mirrored in both engines (Spark NULLs, DuckDB would raise/Inf).
# ---------------------------------------------------------------------------


@query(
    "events_autocorr_lags",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), lags AS (
  SELECT unnest([1, 2, 7, 14]) AS lag
), pairs AS (
  SELECT l.lag, d1.x AS x, d2.x AS y
  FROM lags l
  JOIN daily d1 ON true
  JOIN daily d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
), mo AS (
  SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL
            ELSE {R("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)}
       END AS autocorr
FROM mo
ORDER BY lag
""",
)
def events_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    lags = ev.sparkSession.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(7), F.lit(14))).alias("lag")
    )
    d1 = daily.select(F.col("day").alias("day1"), F.col("x").alias("x"))
    d2 = daily.select(F.col("day").alias("day2"), F.col("x").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(d1)
        .join(d2, F.col("day2") == F.date_add(F.col("day1"), F.col("lag").cast("int")))
    )
    mo = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mo.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(
            pround(
                cov.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            )
        )
        .alias("autocorr"),
    ).orderBy("lag")
