"""Spark 4-native surface: the VARIANT type for semi-structured data
and SQL pipe syntax. Both compile to the same Catalyst plans as the
classic APIs — these queries pin that the engine exposes the modern
entry points, with the usual DuckDB oracles (JSON functions / plain
ANSI SQL) proving identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import sql_money_sum
from ..registry import query

# ---------------------------------------------------------------------------
# VARIANT ingestion of events.props: parse once to the binary variant
# encoding, extract typed fields with variant_get. Unlike
# get_json_object (string re-parse per extraction), a variant column
# is parsed once and shredded columnar — the Spark-4 path for
# semi-structured ingestion at scale.
# ---------------------------------------------------------------------------


@query(
    "events_variant_stats",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.0): the same logical plan as the nested
# classic form, written as a linear dataflow. The oracle is the
# classic ANSI rendering — identical results proves the pipe chain
# lowers to the same semantics.
# ---------------------------------------------------------------------------

_PIPE_SQL = f"""
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             {sql_money_sum("o_totalprice")} AS total
   GROUP BY o_orderpriority
|> WHERE n > 1
|> ORDER BY o_orderpriority
"""


@query(
    "pipe_syntax_priority_summary",
    oracle=f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
HAVING count(*) > 1
ORDER BY o_orderpriority
""",
)
def pipe_syntax_priority_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PIPE_SQL)
