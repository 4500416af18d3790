"""Relational coverage, batch 2: the remaining adaptable TPC-H shapes
plus JSON extraction, window navigation functions, fuzzy string match,
array higher-order functions, and GROUPING SETS.

Ratio-of-sums queries divide two fixed-point money sums — both engines
produce identical numerators/denominators, so the quotient double is
bit-identical (IEEE division is correctly rounded)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import (
    cents,
    money_avg,
    money_sum,
    pround,
    sql_cents as C,
    sql_money_avg as MA,
    sql_money_sum as MS,
    sql_round as R,
)
from ..registry import query

REV_SQL = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q4-shaped: late-shipped orders by priority (EXISTS with range condition)
# ---------------------------------------------------------------------------
@query(
    "q4_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8-shaped: market share of one nation per order year
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ({MS(f"CASE WHEN n_name = 'NATION_3' THEN {REV_SQL} ELSE 0.0 END")}
        / {MS(REV_SQL)}) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nation_rev = F.when(F.col("n_name") == "NATION_3", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((money_sum(nation_rev) / money_sum(_revenue())).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q13-shaped: customer order-count distribution (left join incl. zeros)
# ---------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14-shaped: promo revenue share
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT (100.0 * {MS(f"CASE WHEN p_type = 'PROMO' THEN {REV_SQL} ELSE 0.0 END")}
        / {MS(REV_SQL)}) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-06-01'
  AND l_shipdate <  TIMESTAMP '1996-07-01'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (F.lit(100.0) * money_sum(promo_rev) / money_sum(_revenue())).alias("promo_share")
    )


# ---------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by period revenue (ties kept)
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
WITH srev AS (
  SELECT l_suppkey AS supplier_no, {MS(REV_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN srev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM srev)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    srev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_revenue()).alias("total_revenue")
    )
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        srev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16-shaped: supplier counts by part attributes
# ---------------------------------------------------------------------------
@query(
    "q16_parts_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'BRAND_1' AND p_size IN (1, 5, 9, 13, 17)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17-shaped: small-quantity orders vs per-part average (self-agg join)
# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey AS pk, {MA("l_quantity")} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ({MS("l_extendedprice")} / 7.0) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pk = l_partkey
WHERE p_brand = 'BRAND_1' AND l_quantity < 0.5 * avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND_1")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(money_avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((money_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19-shaped: disjunctive predicate revenue
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {MS(REV_SQL)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'BRAND_1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'BRAND_2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'BRAND_3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "BRAND_1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "BRAND_2") & F.col("p_size").between(5, 20) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "BRAND_3") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(money_sum(_revenue()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20-shaped: suppliers whose shipped quantity of matching parts exceeds
# half that part's total shipped quantity (nested aggregate + semijoin)
# ---------------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    oracle=f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, {MS("l_quantity")} AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey AS pk, {MS("l_quantity")} AS total_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY pk
)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
FROM per_ps
JOIN per_p ON pk = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE qty > 0.5 * total_qty
GROUP BY s_suppkey, s_name
ORDER BY n_dominated_parts DESC, s_suppkey
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    red = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_ps = red.groupBy("l_partkey", "l_suppkey").agg(money_sum("l_quantity").alias("qty"))
    per_p = red.groupBy(F.col("l_partkey").alias("pk")).agg(
        money_sum("l_quantity").alias("total_qty")
    )
    return (
        per_ps.join(per_p, per_ps.l_partkey == per_p.pk)
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Cohort retention: users active in the first week still active in week 4
# ---------------------------------------------------------------------------
@query(
    "events_week4_retention",
    oracle="""
WITH w1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '2024-01-08'
), w4 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-22' AND ts < TIMESTAMP '2024-01-29'
)
SELECT (SELECT count(*) FROM w1) AS cohort,
       (SELECT count(*) FROM w1 WHERE user_id IN (SELECT user_id FROM w4)) AS retained
""",
)
def events_week4_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w1 = ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp")).select(
        "user_id"
    ).distinct()
    w4 = ev.filter(
        (F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-29").cast("timestamp"))
    ).select("user_id").distinct()
    retained = w1.join(w4, "user_id", "left_semi")
    return w1.agg(F.count(F.lit(1)).alias("cohort")).crossJoin(
        retained.agg(F.count(F.lit(1)).alias("retained"))
    )


# ---------------------------------------------------------------------------
# Q22-shaped: wealthy inactive customers by pseudo country code
# ---------------------------------------------------------------------------
@query(
    "q22_wealthy_inactive",
    oracle=f"""
WITH avg_bal AS (
  SELECT {MA("c_acctbal", 4)} AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
       count(*) AS numcust,
       {MS("c_acctbal")} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        money_avg("c_acctbal", 4).alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("long").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), money_sum("c_acctbal").alias("totacctbal"))
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q2-shaped: argmax per group — dominant supplier per part in one region
# ---------------------------------------------------------------------------
@query(
    "q2_top_supplier_per_part",
    oracle=f"""
WITH vol AS (
  SELECT l_partkey, l_suppkey, {MS("l_quantity")} AS qty
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, qty,
         row_number() OVER (PARTITION BY l_partkey ORDER BY qty DESC, l_suppkey) AS rn
  FROM vol
)
SELECT l_partkey, l_suppkey AS top_suppkey, qty
FROM ranked WHERE rn = 1
ORDER BY l_partkey
""",
)
def q2_top_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(money_sum("l_quantity").alias("qty"))
    )
    w = W.partitionBy("l_partkey").orderBy(F.desc("qty"), F.asc("l_suppkey"))
    return (
        vol.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", F.col("l_suppkey").alias("top_suppkey"), "qty")
        .orderBy("l_partkey")
    )


# ---------------------------------------------------------------------------
# JSON extraction from the events props column
# ---------------------------------------------------------------------------
@query(
    "events_json_extract",
    oracle=f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS n,
       {MS("value")} AS total_value
FROM events
GROUP BY k
ORDER BY k
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("total_value"))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Window navigation: lead/lag/rank family over per-user event sequences
# ---------------------------------------------------------------------------
@query(
    "window_navigation_events",
    oracle=f"""
SELECT event_id, user_id,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(rank()       OVER wv AS BIGINT) AS value_rank,
       CAST(dense_rank() OVER wv AS BIGINT) AS value_dense_rank,
       CAST(ntile(4)     OVER wv AS BIGINT) AS quartile
FROM events
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wv AS (PARTITION BY user_id ORDER BY value DESC, event_id)
ORDER BY user_id, event_id
""",
)
def window_navigation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wv = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.rank().over(wv).cast("long").alias("value_rank"),
        F.dense_rank().over(wv).cast("long").alias("value_dense_rank"),
        F.ntile(4).over(wv).cast("long").alias("quartile"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Scalar string-function coverage (portable subset)
# ---------------------------------------------------------------------------
@query(
    "string_functions_demo",
    oracle="""
SELECT p_partkey,
       upper(p_name)                          AS uname,
       reverse(p_name)                        AS rname,
       lpad(p_brand, 12, '.')                 AS padded,
       replace(p_name, ' ', '_')              AS snake,
       split_part(p_name, ' ', 1)             AS first_word,
       CAST(length(p_name) AS BIGINT)         AS name_len,
       substr(p_name, 2, 3)                   AS mid,
       concat(p_brand, '/', p_type)           AS brand_type
FROM part
ORDER BY p_partkey
LIMIT 500
""",
)
def string_functions_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.reverse(F.col("p_name")).alias("rname"),
            F.lpad("p_brand", 12, ".").alias("padded"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 2, 3).alias("mid"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Date-part extraction (portable subset: year/quarter/month/day)
# ---------------------------------------------------------------------------
@query(
    "orders_by_quarter",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT)    AS y,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       count(*) AS n,
       {MS("o_totalprice")} AS revenue
FROM orders
GROUP BY y, q
ORDER BY y, q
""",
)
def orders_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.quarter("o_orderdate").cast("long").alias("q"),
        )
        .agg(F.count(F.lit(1)).alias("n"), money_sum("o_totalprice").alias("revenue"))
        .orderBy("y", "q")
    )


# ---------------------------------------------------------------------------
# Fuzzy string match: levenshtein distance to a probe name
# ---------------------------------------------------------------------------
@query(
    "string_fuzzy_part_match",
    oracle="""
SELECT p_partkey, p_name, CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS dist
FROM part
WHERE levenshtein(p_name, 'red widget') <= 5
ORDER BY dist, p_partkey
""",
)
def string_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return (
        part.select("p_partkey", "p_name", dist.cast("long").alias("dist"))
        .filter(F.col("dist") <= 5)
        .orderBy("dist", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Array higher-order functions: per-user sorted type digests
# ---------------------------------------------------------------------------
@query(
    "array_hof_user_digest",
    oracle="""
SELECT user_id,
       array_to_string(list(DISTINCT event_type ORDER BY event_type), ',') AS types_sorted,
       CAST(len(list(DISTINCT event_type ORDER BY event_type)) AS BIGINT)  AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def array_hof_user_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(",", types).alias("types_sorted"),
            F.size(types).cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# RANGE window frame: trailing 7 CALENDAR days (not 7 rows) of revenue
# ---------------------------------------------------------------------------
@query(
    "window_range_7day_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS day_num,
         strftime(o_orderdate, '%Y-%m-%d') AS d,
         {MS("o_totalprice")} AS revenue
  FROM orders GROUP BY day_num, d
)
SELECT d, revenue,
       (CAST(sum({C("revenue")}) OVER (
          ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0)
         AS trailing_7d
FROM daily
ORDER BY d
""",
)
def window_range_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frame over day numbers: calendar-aware trailing sum that is
    # correct across gaps in the date series (a ROWS frame is not).
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400.0))
        .cast("long")
        .alias("day_num"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
    ).agg(money_sum("o_totalprice").alias("revenue"))
    w = W.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.withColumn(
            "trailing_7d", F.sum(cents("revenue")).over(w) / F.lit(100.0)
        )
        .select("d", "revenue", "trailing_7d")
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Portable variance/stddev: engines' stddev_samp implementations
# (Welford vs sum-of-squares) produce different float noise, so compute
# variance from EXACT integer fixed-point sums: n·Σx² − (Σx)² over
# n(n−1). Σx in cents (<2^63 to sf~1e4); Σx² in whole units² so the
# per-segment sum stays ~9e16 at sf1 — two orders of magnitude of
# headroom below 2^63 (cents²·1e-2 would hit 2^63 near sf1). Both
# engines sum the SAME integers, so the parity is exact by construction.
# ---------------------------------------------------------------------------
@query(
    "variance_order_value",
    oracle=f"""
WITH c AS (
  SELECT c_mktsegment, {R("o_totalprice")} AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
), s AS (
  SELECT c_mktsegment,
         count(*) AS n,
         CAST(sum(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(v * v + 0.5) AS BIGINT)) AS BIGINT) AS sxx
  FROM c GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       {R("((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / 100.0) * (CAST(sx AS DOUBLE) / 100.0)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))", 2)} AS variance,
       {R("sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) / 100.0) * (CAST(sx AS DOUBLE) / 100.0)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))", 2)} AS stddev
FROM s
ORDER BY c_mktsegment
""",
)
def variance_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    v = pround("o_totalprice")
    sx_term = F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("long")
    sxx_term = F.floor(v * v + F.lit(0.5)).cast("long")
    s = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sx_term).cast("long").alias("sx"),
            F.sum(sxx_term).cast("long").alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double") / F.lit(100.0)
    sxxd = F.col("sxx").cast("double")
    var = (nd * sxxd - sxd * sxd) / (nd * (nd - F.lit(1.0)))
    return s.select(
        "c_mktsegment",
        "n",
        pround(var, 2).alias("variance"),
        pround(F.sqrt(var), 2).alias("stddev"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# GROUPING SETS via the SQL API — the fragment is engine-portable, so the
# Spark query text IS the oracle text.
# ---------------------------------------------------------------------------
_GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {MS("l_quantity")} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("grouping_sets_flags", oracle=_GROUPING_SETS_SQL)
def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)
