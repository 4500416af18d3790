"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query; `queries()` / `oracle_sql()`
expose every implemented operator from SURVEY.md §2 with its DuckDB
oracle. See statcan_etl_pipeline_spark/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from statcan_etl_pipeline_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks queries() in dict order (it
# verified exactly the first 50 in round 1), so order the registry to put
# not-yet-hash-verified and newly added queries first; queries already
# hash-verified in a prior round's CORRECTNESS_r*.json come after.
_CHECK_FIRST = [
    # --- ROUND 10 WINDOW (VERDICT r9 item 1): with cumulative
    # verification debt at zero (275/275 driver-hash-green over r1-r9),
    # this round rotates evidence FRESHNESS. Positions 0-1: the only two
    # queries whose source/oracle changed in r10 (the SURVEY §5.9 window
    # invariant — scripts/check_window.py enforces it). Positions 2-49:
    # the 48 stalest verifications — every query whose latest driver
    # hash evidence dates to r1 (11 queries) or r2 (37 queries), i.e.
    # seven-plus rounds old. Computed programmatically from
    # CORRECTNESS_r01..r09 (latest all-green round per query). ---
    "dedup_minhash_lsh",  # r10-modified: LSH band-bucket cap + oracle
    "events_markov_stationary",  # r10-modified: structural k<=64 guard
    # --- 11 queries last driver-verified in ROUND 1 ---
    "dedup_embedding_cosine",  # also r10-modified: self-dots hoisted (bit-identical)
    "dedup_simhash",
    "dq_validation_report",
    "multimodal_binary_meta",
    "pipeline_declarative_demo",
    "scd2_user_daily_value",
    "statcan_latest_revision",
    "statcan_locf_gapfill",
    "statcan_pct_change_yoy",
    "statcan_vector_timeseries",
    "upsert_orders_corrections",
    # --- 37 queries last driver-verified in ROUND 2 ---
    "array_hof_user_digest",
    "basket_part_affinity",
    "cms_word_frequency",
    "corpus_quality_filter",
    "corpus_top_words",
    "corpus_vocab_stats",
    "corr_price_quantity",
    "date_arithmetic_demo",
    "embedding_norm_stats",
    "events_dau_wau",
    "events_funnel_conversion",
    "events_hourly_anomalies",
    "events_sliding_1h_15m",
    "events_tumbling_1h",
    "grouping_sets_flags",
    "histogram_order_values",
    "kmv_distinct_parts",
    "multimodal_kind_catalog",
    "null_semantics_demo",
    "orders_by_quarter",
    "q11_important_stock",
    "q21_waiting_suppliers",
    "range_join_events_after_signup",
    "rfm_segments",
    "safe_cast_demo",
    "sample_hash_bucket",
    "setops_active_users",
    "statcan_rebase_index",
    "string_functions_demo",
    "string_fuzzy_part_match",
    "text_langid",
    "text_repetition_ratio",
    "text_token_counts",
    "variance_order_value",
    "window_distribution_functions",
    "window_navigation_events",
    "window_range_7day_revenue",
    # --- everything below position 50 is driver-green from r4-r9;
    # next-stalest (r4) first so future rotations read top-down. The
    # registry fills any name not listed here in QUERIES order. ---
    "q6_forecast_revenue",
    "topk_customers_by_revenue",
    "dedup_exact",
    "cdc_orders_diff",
    "dedup_embedding_lsh",
    "contamination_check",
    "doc_token_chunks",
    "doc_greedy_packing",
    "ann_ivf_cosine",
    "ann_lsh_cosine",
    "ann_pq_cosine",
    "ann_ivfpq_cosine",
    "ann_sq_cosine",
    "events_week4_retention",
    "events_json_extract",
    "q2_top_supplier_per_part",
    "q4_late_shipment_priority",
    "q8_market_share",
    "q10_returned_items",
    "q12_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q22_wealthy_inactive",
    "q7_volume_shipping",
    "anti_join_customers_without_orders",
    "semi_join_suppliers_with_returns",
    "distinct_mktsegments",
    "agg_cube_flags",
    "pivot_status_by_segment",
    "unpivot_part_measures",
    "window_running_revenue",
    "percentiles_order_value",
    "percentile_disc_order_value",
    "full_outer_nation_coverage",
    "dense_region_status_grid",
    "benford_order_totals",
    "abc_part_classification",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(ORACLES)
