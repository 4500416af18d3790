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
    # --- ROUND 15 WINDOW (VERDICT r14 item 3). Positions 0-3: this
    # round's changed queries — the dedup-below-verify rewrite in
    # _embedding_lsh_pairs (both consumers; results bit-identical,
    # parity-checked exact at sf0.1, see OPTIMIZATION_r15.md item 4),
    # the k-core broadcast-guard edit (join-strategy only, results
    # bit-identical), and part_copurchase_triangles (hash moved vs the
    # r14 snapshot; its current code was already driver-verified green
    # in CORRECTNESS_r14 — kept in-window for the snapshot refresh). ---
    "dedup_embedding_lsh",
    "dedup_embedding_groups",
    "part_kcore_decomposition",
    "part_copurchase_triangles",
    # --- Positions 4-6: the r15 lsh_pairs_from_index dedup=False
    # change — copurchase_part_similarity's hash moved (same-module
    # helper); dedup_minhash_lsh + minhash_jaccard_calibration are the
    # operator's most-direct consumers (default path byte-equivalent,
    # rotated in per the SURVEY §5 changed-code-gets-driver-evidence
    # convention; the cross-module v2 hash gap means their hashes did
    # not move). Three r9-block members defer to the tail for r16. ---
    "copurchase_part_similarity",
    "dedup_minhash_lsh",
    "minhash_jaccard_calibration",
    # --- Positions 7-12: the six r8-stale deferrals (VERDICT r14
    # item 4c / r15 item 3) — the freshness floor moves to r9. ---
    "stratified_sample_exact",
    "survey_ht_total_audit",
    "text_stopword_profile",
    "user_weekly_survival",
    "approx_distinct_parts_by_flag",
    "approx_quantiles_order_value",
    # --- Positions 13-49: the r9 block, next-stalest first (37 of
    # 46; the remaining nine lead the tail below for the r16 window —
    # three were evicted when the lsh_pairs_from_index trio above
    # rotated in). ---
    "asof_join_cogrouped",
    "bom_explosion_recursive",
    "business_day_ship_latency",
    "collated_segment_rollup",
    "corpus_cross_source_overlap",
    "customer_value_migration",
    "asof_join_purchase_to_view",
    "atkinson_inequality_by_nation",
    "boilerplate_ngram_ratio",
    "corpus_temperature_sampling",
    "customer_repurchase_cycle",
    "doc_bm25_search",
    "doc_dsir_importance_weights",
    "doc_perplexity_buckets",
    "doc_rrf_quality_fusion",
    "doc_shingle_containment",
    "event_type_trigrams",
    "events_bounce_rate_daily",
    "events_cuped_variance_reduction",
    "hll_mergeable_rollup",
    "kruskal_wallis_order_value",
    "mwu_order_value_segments",
    "nation_trade_balance",
    "orders_chain_ladder_completion",
    "orders_kaplan_meier_ship_latency",
    "pipeline_topk_per_segment",
    "price_qty_regression_by_type",
    "q18_large_orders",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "sessionize_events",
    "spearman_price_acctbal",
    "statcan_allocation_largest_remainder",
    "statcan_gvf_cv_model",
    "statcan_random_rounding_base5",
    "survey_jackknife_variance",
    "survey_neyman_allocation",
    "survey_winsorized_total",
    # --- everything below position 49 is driver-green from r9-r14;
    # next-stalest first so future rotations read top-down: the six
    # remaining r9 names, then the 48 members verified in r14. ---
    "text_fingerprint",
    "text_quality_score",
    "text_rake_keywords",
    "text_stats",
    "tukey_hsd_pairwise",
    "window_top3_parts_per_supplier",
    "copurchase_band_census",
    "copurchase_minhash_calibration",
    "ann_planted_recall_contract",
    "graph_pagerank",
    "part_label_propagation_communities",
    "copurchase_degree_distribution",
    "agg_rollup_sales",
    "tfidf_top_terms",
    "dedup_ngram_jaccard",
    "dedup_connected_groups",
    "dedup_cluster_size_census",
    "dedup_token_savings_by_source",
    "doc_novelty_by_order",
    "doc_script_mix",
    "doc_token_arrow_stats",
    "embedding_interclass_similarity",
    "er_supplier_name_pairs",
    "events_autocorr_lags",
    "events_cusum_drift",
    "events_error_alert_transitions",
    "events_error_pchart",
    "events_ewma_daily",
    "events_hour_of_week_profile",
    "events_multitouch_attribution",
    "events_ohlc_hourly",
    "events_value_quartile_bands",
    "events_zseason_weekday_lift",
    "join_key_skew_report",
    "lineitem_quantity_mode_profile",
    "lineitem_tax_audit",
    "multimodal_frame_catalog",
    "ngram_pmi_collocations",
    "orders_backlog_aging",
    "orders_calendar_spine_recursive",
    "orders_column_profile",
    "orders_latency_qq_by_priority",
    "orders_priority_mix_shift",
    "part_brand_price_ladder",
    "price_index_fisher",
    "revenue_contribution_growth",
    "session_top_paths",
    "statcan_calendarization",
    "statcan_cell_suppression",
    "statcan_cv_quality_grades",
    "statcan_revision_analysis",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(ORACLES)
