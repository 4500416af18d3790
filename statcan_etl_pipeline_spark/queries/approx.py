"""Approximate aggregates — the 100 TB substitutes for exact distinct
counts and percentiles. Sketch internals differ per engine, so these
are rows-only for the driver; tests/test_approx.py bounds their error
against the exact answers.

- approx_count_distinct: HyperLogLog++ (rsd 2%) — constant memory vs
  the O(distinct) hash set an exact count needs per group.
- percentile_approx: Greenwald-Khanna — single pass, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query("approx_distinct_parts_by_flag")  # rows-only: HLL sketch is engine-specific
def approx_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@query("approx_quantiles_order_value")  # rows-only: GK sketch is engine-specific
def approx_quantiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
        )
        .orderBy("c_mktsegment")
    )
