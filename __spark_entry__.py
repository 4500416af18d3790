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
    # --- ROUND 11 WINDOW. Positions 0-17: every query whose source or
    # oracle changed this round (scripts/check_window.py enforces) —
    # the six r10-verdict perf items (PQ/IVFPQ self-dot hoist,
    # with_pair_cosine fold materialization, LSH_BUCKET_CAP threading
    # through the four uncapped lsh_candidate_pairs consumers,
    # star-components switch, banded embedding-LSH rewrite) plus the
    # NEW dedup_lsh_bucket_census. dedup_embedding_groups' v1 hash did
    # not move (one-line body over the rewritten _embedding_lsh_pairs
    # helper) — rotated in anyway per the r10 ADVICE; the v2 manifest
    # (helper-closure hashes) closes that hole for future rounds.
    # Positions 18-19: dedup-module siblings whose file changed
    # (helper-edit triage rotated in). Positions 20-24: continuation-
    # session perf rewrites (part_copurchase_triangles canonical
    # wedge-close probe; part_kcore_decomposition shrinking-set peel;
    # copurchase_part_similarity checkpointed lineage;
    # shingle_df_spectrum map-side dedup; knn_label_eval
    # with_pair_cosine), must sit in-window. Positions 25-49: 25 of
    # the 34 remaining r4-verified queries — the stalest evidence
    # block, computed programmatically from CORRECTNESS_r01..r10
    # (latest all-green round per query). The 9 r4 stragglers deferred
    # to r12 for capacity: dense_region_status_grid,
    # full_outer_nation_coverage, percentile_disc_order_value,
    # unpivot_part_measures, plus percentiles_order_value,
    # window_running_revenue, agg_cube_flags, pivot_status_by_segment
    # and semi_join_suppliers_with_returns (displaced by the five perf
    # rewrites). ---
    "dedup_lsh_bucket_census",  # NEW (r11): cap companion report
    "dedup_minhash_lsh",
    "dedup_connected_groups",
    "dedup_cluster_size_census",
    "dedup_token_savings_by_source",
    "minhash_jaccard_calibration",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_embedding_groups",
    "knn_bruteforce_cosine",
    "ann_ivf_cosine",
    "ann_lsh_cosine",
    "ann_pq_cosine",
    "ann_ivfpq_cosine",
    "ann_sq_cosine",
    "ann_range_search",
    "hard_negative_mining",
    "embedding_matryoshka_recall",
    # --- dedup-module siblings (file changed; bodies/helpers did not) ---
    "dedup_ngram_jaccard",
    "dedup_incremental_delta",
    # --- continuation-session perf rewrites (must sit in-window) ---
    "part_copurchase_triangles",  # single canonical wedge-close probe
    "part_kcore_decomposition",  # peel the shrinking edge set
    "copurchase_part_similarity",  # checkpointed edge lineage
    "shingle_df_spectrum",  # map-side per-doc shingle dedup
    "knn_label_eval",  # with_pair_cosine fold materialization
    # --- 30 queries last driver-verified in ROUND 4 ---
    "dedup_exact",
    "q6_forecast_revenue",
    "topk_customers_by_revenue",
    "cdc_orders_diff",
    "contamination_check",
    "doc_token_chunks",
    "doc_greedy_packing",
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
    "window_running_revenue",
    "percentiles_order_value",
    # --- everything below position 50 is driver-green from r4-r10;
    # next-stalest first so future rotations read top-down. The
    # registry fills any name not listed here in QUERIES order. ---
    "dense_region_status_grid",
    "full_outer_nation_coverage",
    "percentile_disc_order_value",
    "unpivot_part_measures",
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
