"""Spark-side `WITH RECURSIVE` (Spark 4): the SAME SQL text runs on
Spark AND on the DuckDB oracle — the two engines execute one query
string, so parity checks the recursion semantics themselves, not a
re-implementation.

Spark 4 restricts recursive CTEs to UNION ALL (no distinct-union), so
only ACYCLIC recursion terminates: cyclic reach propagation (connected
components) stays on the iterative DataFrame path
(operators/components.py), whose DuckDB oracle uses recursive SQL on
the oracle side only. The two shapes here are the acyclic classics:

- BOM explosion: walk a part hierarchy root→leaf. The hierarchy is
  synthetic (parent(k) = k div 10 — the testdata has no BOM edge
  table) but the recursion is the real thing: each level is one join
  against the dimension table, depth is bounded by the key width
  (log10 of max key, 7 levels at 100 TB), and every node has exactly
  one parent so the working set never re-expands. At scale each
  iteration is a broadcast-joinable dim lookup — no fact-table
  re-scan per level.
- Calendar spine: generate the month dimension by recursion and LEFT
  JOIN the orders aggregate onto it, so empty months surface with
  zero counts (a plain GROUP BY silently drops them). The recursive
  branch grows by ONE row per step over a bounded date range —
  driver-side trivial, and the fact aggregation is a single
  map-combinable shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions.portable import sql_cents, sql_money_sum
from ..registry import query

# Shared Spark/DuckDB text. Integer parent derivation uses
# floor(k / 10.0) (both engines agree; neither needs `div` vs `//`).
_BOM_SQL = f"""
WITH RECURSIVE bom AS (
  SELECT p_partkey AS root_key, p_partkey AS part_key, 0 AS depth,
         {sql_cents("p_retailprice")} AS retail_c
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT b.root_key, c.p_partkey AS part_key, b.depth + 1 AS depth,
         {sql_cents("c.p_retailprice")} AS retail_c
  FROM bom b JOIN part c
    ON c.p_partkey >= 10 AND CAST(floor(c.p_partkey / 10.0) AS BIGINT) = b.part_key
)
SELECT root_key, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(retail_c) AS BIGINT) AS subtree_retail_c
FROM bom GROUP BY root_key ORDER BY root_key
"""


@query("bom_explosion_recursive", oracle=_BOM_SQL)
def bom_explosion_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_BOM_SQL)


# Bounds are the testdata's fixed order-date domain (1995-01..2001-08).
_SPINE_SQL = f"""
WITH RECURSIVE months(month_start) AS (
  SELECT CAST('1995-01-01' AS TIMESTAMP)
  UNION ALL
  SELECT month_start + INTERVAL '1' MONTH FROM months
  WHERE month_start < CAST('2001-08-01' AS TIMESTAMP)
),
m AS (
  SELECT date_trunc('month', o_orderdate) AS ms,
         count(*) AS n, {sql_money_sum("o_totalprice")} AS tot
  FROM orders GROUP BY ms
)
SELECT month_start,
       CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(tot, 0.0) AS DOUBLE) AS month_revenue
FROM months LEFT JOIN m ON ms = month_start
ORDER BY month_start
"""


@query("orders_calendar_spine_recursive", oracle=_SPINE_SQL)
def orders_calendar_spine_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SPINE_SQL)
