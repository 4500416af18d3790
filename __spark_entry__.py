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
    # --- ROUND 12 WINDOW. Positions 0-8: the 9 queries whose latest
    # driver evidence is ROUND 4 — the stalest block (verdict item 1),
    # computed programmatically from CORRECTNESS_r01..r11 (latest
    # all-green round per query). ---
    "agg_cube_flags",
    "dense_region_status_grid",
    "distinct_mktsegments",
    "full_outer_nation_coverage",
    "percentile_disc_order_value",
    "percentiles_order_value",
    "pivot_status_by_segment",
    "unpivot_part_measures",
    "window_running_revenue",
    # --- Positions 9-12: the three queries whose source changed this
    # round (scripts/check_window.py enforces in-window) plus the one
    # NEW query: the banded candidates-then-verify rewrite of
    # copurchase_part_similarity (verdict item 2), the k-core
    # early-exit + per-round checkpoint release (verdict item 3 +
    # ADVICE), the brute-cosine structural input guard (verdict item
    # 4), and copurchase_band_census (NEW r12: the banding cap's
    # no-silent-drop companion, the dedup_lsh_bucket_census
    # precedent). ---
    "copurchase_part_similarity",
    "part_kcore_decomposition",
    "dedup_embedding_cosine",
    "copurchase_band_census",
    # --- Positions 13-49: 37 of the 42 queries last driver-verified in
    # ROUND 5 (next-stalest block). The five r5 queries displaced by
    # the changed/new slots above are DEFERRED to r13 and listed first
    # below position 50: events_variant_stats,
    # pipe_syntax_priority_summary, udtf_token_positions,
    # group_by_all_revenue, statcan_seasonal_decompose. ---
    "abc_part_classification",
    "asof_join_with_tolerance",
    "benford_order_totals",
    "chi2_segment_priority",
    "copurchase_degree_distribution",
    "corpus_length_trim",
    "corpus_mixture_resample",
    "corpus_source_report",
    "customer_ltv_cohort",
    "doc_global_shuffle",
    "doc_greedy_packing_sharded",
    "doc_language_confusion",
    "doc_simpson_diversity",
    "doc_train_val_split",
    "doc_unigram_rarity",
    "embedding_centroids_by_label",
    "embedding_kmeans",
    "events_cumulative_unique_users",
    "events_daily_mad_anomalies",
    "events_daily_trend",
    "events_interarrival_stats",
    "events_moving_corr_7d",
    "events_strict_funnel_pattern",
    "events_user_transitions",
    "funnel_time_to_convert",
    "gini_customer_revenue",
    "graph_pagerank",
    "orders_open_intervals_daily",
    "orders_price_bands",
    "pareto_frontier_parts",
    "pii_scan_tables",
    "session_duration_histogram",
    "statcan_interpolate_linear",
    "supplier_hhi_by_nation",
    "supplier_share_of_nation",
    "top_ngrams_per_lang",
    "weighted_median_price_by_brand",
    # --- everything below position 50 is driver-green from r5-r11;
    # next-stalest first so future rotations read top-down: the five
    # deferred r5s, then the r6 block. ---
    "events_variant_stats",
    "pipe_syntax_priority_summary",
    "udtf_token_positions",
    "group_by_all_revenue",
    "statcan_seasonal_decompose",
    "anova_order_value_by_priority",
    "brand_return_rate_wilson",
    "corpus_bpe_merges",
    "corpus_dataset_card",
    "doc_feature_hash_embedding",
    "doc_length_powerlaw_by_source",
    "embedding_dim_stats",
    "embedding_label_outliers",
    "embedding_pca_top_component",
    "embedding_sq_error_curve",
    "events_burstiness_fano",
    "events_rolling_7d_active_users",
    "events_type_cooccurrence",
    "holt_linear_daily",
    "interdoc_chunk_dedup",
    "ks_order_value_by_priority",
    "lateral_alias_margin",
    "mmr_diversified_topk",
    "nation_type_rca",
    "orders_fiscal_year_summary",
    "orders_lorenz_deciles",
    "orders_median_polish",
    "orders_runs_test_daily",
    "orders_sla_fulfillment",
    "parameterized_sql_topn",
    "price_index_chained_fisher",
    "price_index_contributions",
    "rotation_panel_estimates",
    "seasonal_naive_backtest",
    "statcan_chain_linked_index",
    "statcan_denton_prorata",
    "statcan_hotdeck_imputation",
    "statcan_price_relative_fences",
    "statcan_x11_trend",
    "supplier_concentration_cr4",
    "survey_raking_calibration",
    "theil_sen_price_qty_by_type",
    "tokenizer_fertility_by_lang",
    "vocab_coverage_curve",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(ORACLES)
