"""Relational core: TPC-H-shaped analytics adapted to the testdata columns.

Spark side is pure DataFrame API (Catalyst sees the whole plan: filter
pushdown, column pruning, broadcast dim joins). Oracles are ANSI SQL for
DuckDB with identical output column names and identical (portable,
floor-based) rounding — see functions/portable.py.

Scale notes (100 TB): every query here aggregates before any ordering;
top-k is agg → orderBy → limit (partial-agg + TakeOrdered, no global
sort of the fact table); dimension joins are broadcast; windows
partition by bounded keys except the explicitly-small post-aggregate
daily series in `window_running_revenue`.
"""

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
# Q1: pricing summary — scan + filter + wide aggregate
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {MS("l_quantity")}                                  AS sum_qty,
       {MS("l_extendedprice")}                             AS sum_base_price,
       {MS(REV_SQL)}                                       AS sum_disc_price,
       {MS(f"{REV_SQL} * (1 + l_tax)")}                    AS sum_charge,
       {MA("l_quantity")}                                  AS avg_qty,
       {MA("l_extendedprice")}                             AS avg_price,
       {MA("l_discount", 4)}                               AS avg_disc,
       count(*)                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(_revenue()).alias("sum_disc_price"),
            money_sum(_revenue() * (1 + F.col("l_tax"))).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            money_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3: top unshipped orders — 3-way join + top-k
# ---------------------------------------------------------------------------
@query(
    "q3_top_unshipped",
    oracle=f"""
SELECT l_orderkey,
       {MS(REV_SQL)}                     AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume — snowflake join (region→nation→cust/supp)
# ---------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {MS(REV_SQL)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — tight scan filter, single aggregate
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {MS("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name                        AS supp_nation,
       n2.n_name                        AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {MS(REV_SQL)}                    AS revenue
FROM supplier
JOIN lineitem  ON s_suppkey = l_suppkey
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit (pseudo supply cost: 50% of retail price)
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
SELECT n_name                            AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {MS(f"{REV_SQL} - 0.5 * p_retailprice * l_quantity")} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(money_sum("profit").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q10: returned-items revenue by customer — top-k
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       {MS(REV_SQL)}  AS revenue,
       {R("any_value(c_acctbal)")} AS acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(_revenue()).alias("revenue"),
            pround(F.first("c_acctbal")).alias("acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12-shaped: order-priority class counts by return flag (conditional agg)
# ---------------------------------------------------------------------------
@query(
    "q12_priority_class",
    oracle="""
SELECT l_returnflag,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_count"),
            F.count(F.when(~is_high, 1)).alias("low_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q18: large-volume orders — groupBy-HAVING then join back
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {R("any_value(o_totalprice)")}    AS totalprice,
       {MS("l_quantity")}                AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, orderdate
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select(F.col("l_orderkey").alias("_bk"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == F.col("_bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(
            pround(F.first("o_totalprice")).alias("totalprice"),
            money_sum("l_quantity").alias("sum_qty"),
        )
        .select("c_name", "c_custkey", "o_orderkey", "orderdate", "totalprice", "sum_qty")
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Set ops / semi / anti
# ---------------------------------------------------------------------------
@query(
    "distinct_mktsegments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


@query(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "semi_join_suppliers_with_returns",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
ORDER BY s_suppkey
""",
)
def semi_join_suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Grouping sets: rollup & cube
# ---------------------------------------------------------------------------
@query(
    "agg_rollup_sales",
    oracle=f"""
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {MS(REV_SQL)}                     AS revenue,
       count(DISTINCT o_orderkey)        AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_year)
ORDER BY n_name NULLS FIRST, o_year NULLS FIRST
""",
)
def agg_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # Pre-aggregate at the (nation, year) leaf, then roll up plain sums:
    # every order maps to exactly ONE leaf (one customer → one nation;
    # one orderdate → one year), so distinct counts are additive and the
    # rollup's Expand runs over ~|nations×years| rows instead of the raw
    # join (measured 2.7× at sf0.1). Revenue stays exact integer cents
    # until the final division.
    # r14 (guide §2.3 — partial aggregation before the join): lineitem
    # first collapses to one exact integer-cent revenue row PER ORDER,
    # so the order/customer join moves ~4× fewer rows and the leaf's
    # countDistinct(o_orderkey) becomes a plain count(*) (each order
    # contributes exactly one row). Revenue is identical — integer
    # cents are associative — and the order set is unchanged (orders
    # without lineitems appear in neither shape). Interleaved A/B
    # min-of-3 won all three pairs: 2.16/1.41/1.33 → 1.14/0.92/0.86 s.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents(_revenue())).alias("rev_c")
    )
    leaf = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("n_name", "o_year")
        .agg(
            F.sum("rev_c").alias("rev_c"),
            F.count(F.lit(1)).alias("n_o"),
        )
    )
    return (
        leaf.rollup("n_name", "o_year")
        .agg(
            (F.sum("rev_c") / F.lit(100.0)).alias("revenue"),
            F.sum("n_o").alias("n_orders"),
        )
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_year"))
    )


@query(
    "agg_cube_flags",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {MS("l_quantity")} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------
@query(
    "pivot_status_by_segment",
    oracle="""
SELECT c_mktsegment,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
    ).orderBy("c_mktsegment")


@query(
    "unpivot_part_measures",
    oracle=f"""
SELECT p_partkey, 'p_retailprice' AS measure, {R("p_retailprice")} AS value FROM part
UNION ALL
SELECT p_partkey, 'p_size' AS measure, {R("CAST(p_size AS DOUBLE)")} AS value FROM part
ORDER BY p_partkey, measure
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        pround("p_retailprice").alias("p_retailprice"),
        pround(F.col("p_size").cast("double")).alias("p_size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("p_partkey", "measure")


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------
@query(
    "window_top3_parts_per_supplier",
    oracle=f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey, {MS("l_quantity")} AS sum_qty
  FROM lineitem GROUP BY l_suppkey, l_partkey
), r AS (
  SELECT l_suppkey, l_partkey, sum_qty,
         CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY sum_qty DESC, l_partkey) AS BIGINT) AS rn
  FROM sp
)
SELECT l_suppkey, l_partkey, sum_qty, rn FROM r WHERE rn <= 3
ORDER BY l_suppkey, rn
""",
)
def window_top3_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(money_sum("l_quantity").alias("sum_qty"))
    w = W.partitionBy("l_suppkey").orderBy(F.desc("sum_qty"), F.asc("l_partkey"))
    return (
        sp.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    )


@query(
    "window_running_revenue",
    oracle=f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         {MS("o_totalprice")} AS revenue
  FROM orders GROUP BY d
)
SELECT d, revenue,
       (CAST(sum({C("revenue")}) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0) AS running,
       ((CAST(sum({C("revenue")}) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0)
        / count(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS mov7
FROM daily
ORDER BY d
""",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The window is over the POST-AGGREGATE daily series (~2.5k rows at
    # any SF — bounded by calendar days), so a single-partition ordered
    # window is safe here; the fact-table scan itself never sorts globally.
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")).agg(
        money_sum("o_totalprice").alias("revenue")
    )
    w = W.orderBy("d")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    w7 = w.rowsBetween(-6, 0)
    return (
        daily.withColumn("running", F.sum(cents("revenue")).over(wcum) / F.lit(100.0))
        .withColumn(
            "mov7",
            (F.sum(cents("revenue")).over(w7) / F.lit(100.0)) / F.count(F.lit(1)).over(w7),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Percentiles / top-k
# ---------------------------------------------------------------------------
@query(
    "percentiles_order_value",
    oracle=f"""
SELECT c_mktsegment,
       {R("quantile_cont(o_totalprice, 0.5)")} AS p50,
       {R("quantile_cont(o_totalprice, 0.9)")} AS p90,
       count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            pround(F.expr("percentile(o_totalprice, 0.5)")).alias("p50"),
            pround(F.expr("percentile(o_totalprice, 0.9)")).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "topk_customers_by_revenue",
    oracle=f"""
SELECT c_custkey, c_name, {MS("o_totalprice")} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 25
""",
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(money_sum("o_totalprice").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(25)
    )
