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
    # --- ROUND 9 WINDOW, positions 0-23: the 24 r7 queries that have
    # NEVER been driver-hash-verified (VERDICT r8 item 1 — they sat at
    # [50:74] for two rounds). Six of them (survey_winsorized_total,
    # survey_jackknife_variance, survey_neyman_allocation,
    # atkinson_inequality_by_nation, statcan_gvf_cv_model,
    # statcan_random_rounding_base5) were also MODIFIED in r8
    # (broadcast-hint removals) and so carry modified-unverified code.
    # Once CORRECTNESS_r09 is green, every registered query has driver
    # hash evidence at least once. ---
    "kruskal_wallis_order_value",  # doubled-midrank KW H + tie correction
    "survey_winsorized_total",  # r8-modified: fact broadcast dropped
    "survey_jackknife_variance",  # r8-modified: fact broadcast dropped
    "survey_neyman_allocation",  # r8-modified: fact broadcast dropped
    "atkinson_inequality_by_nation",  # r8-modified: fact broadcast dropped
    "statcan_gvf_cv_model",  # r8-modified: fact broadcast dropped
    "statcan_random_rounding_base5",  # r8-modified: fact broadcast dropped
    "doc_dsir_importance_weights",  # hashed-unigram DSIR log-ratios
    "doc_shingle_containment",  # asymmetric subset-dup containment
    "event_type_trigrams",  # behavioural trigram mining
    "events_bounce_rate_daily",  # single-event session share
    "doc_rrf_quality_fusion",  # integer reciprocal-rank fusion
    "hll_mergeable_rollup",  # two-level sketch union, band-audited
    "text_rake_keywords",  # RAKE phrases, integer deg/freq scores
    "orders_chain_ladder_completion",  # development-triangle nowcast
    "tukey_hsd_pairwise",  # post-hoc pairwise HSD verdicts
    "orders_kaplan_meier_ship_latency",  # product-limit survival
    "part_label_propagation_communities",  # deterministic LPA census
    "doc_bm25_search",  # BM25 ranked retrieval, integer scores
    "doc_perplexity_buckets",  # CCNet head/middle/tail quality gate
    "corpus_temperature_sampling",  # tau=0.7 source mixing weights
    "events_cuped_variance_reduction",  # CUPED theta + rho^2 audit
    "embedding_matryoshka_recall",  # truncated-dim recall audit
    "dedup_incremental_delta",  # delta-vs-index dedup, no corpus self-join
    # --- positions 24-49: round-9 new queries (added this round → must
    # be in this round's window per the SURVEY §5 invariant), then a
    # re-verify rotation biased toward recently-touched code: the r6
    # plan-touched set, graph.py (r8 docstring/budget work), approx.py,
    # and the bench headliners whose plans the perf work leans on. ---
    "tfidf_top_terms",  # r6-touched: doc-count folded into plan
    "dedup_ngram_jaccard",  # r6-touched: hot-shingle df cap
    "text_quality_score",  # r6-touched: trailing orderBy dropped
    "text_stats",  # r6-touched: trailing orderBy dropped
    "text_fingerprint",  # r6-touched: trailing orderBy dropped
    "boilerplate_ngram_ratio",  # r6-touched: trailing orderBy dropped
    "part_copurchase_triangles",  # r6-touched: even-int wedge halves
    "price_qty_regression_by_type",  # r6-touched: zero-denom OLS guard
    "customer_repurchase_cycle",  # r9-modified: customer broadcast dropped
    "nation_trade_balance",  # r9-modified: customer broadcast dropped
    "spearman_price_acctbal",  # r9-modified: customer broadcast dropped
    "statcan_allocation_largest_remainder",  # r9-modified: bcast dropped
    "pipeline_topk_per_segment",  # r9-modified: spec broadcast=False
    "mwu_order_value_segments",  # r9-modified: customer broadcast dropped
    "events_markov_stationary",  # r9-modified: bounded-matrix driver fold
    "q1_pricing_summary",  # bench headliner re-verify
    "q3_top_unshipped",  # bench headliner re-verify
    "q5_local_supplier_volume",  # bench headliner re-verify
    "q9_product_profit",  # bench headliner re-verify
    "q18_large_orders",  # bench headliner re-verify
    "agg_rollup_sales",  # bench headliner re-verify
    "window_top3_parts_per_supplier",  # bench headliner re-verify
    "sessionize_events",  # bench headliner re-verify
    "dedup_minhash_lsh",  # bench headliner re-verify
    "knn_bruteforce_cosine",  # bench headliner re-verify
    "asof_join_purchase_to_view",  # bench headliner re-verify
    # --- everything below is driver-green from r1-r8 (backfill order) ---
    "events_multitouch_attribution",
    "events_value_quartile_bands",
    "lineitem_tax_audit",
    "orders_latency_qq_by_priority",
    "events_error_pchart",
    "copurchase_part_similarity",
    "bom_explosion_recursive",
    "orders_calendar_spine_recursive",
    "doc_novelty_by_order",
    "corpus_cross_source_overlap",
    "events_ohlc_hourly",
    "revenue_contribution_growth",
    "dedup_cluster_size_census",
    "embedding_interclass_similarity",
    "multimodal_frame_catalog",
    "statcan_revision_analysis",
    "stratified_sample_exact",
    "collated_segment_rollup",
    "er_supplier_name_pairs",
    "session_top_paths",
    "user_weekly_survival",
    "join_key_skew_report",
    "events_ewma_daily",
    "price_index_fisher",
    "customer_value_migration",
    "events_error_alert_transitions",
    "orders_backlog_aging",
    "minhash_jaccard_calibration",
    "statcan_cell_suppression",
    "statcan_cv_quality_grades",
    "statcan_calendarization",
    "ngram_pmi_collocations",
    "business_day_ship_latency",
    "events_cusum_drift",
    "events_autocorr_lags",
    "approx_distinct_parts_by_flag",
    "approx_quantiles_order_value",
    "shingle_df_spectrum",
    "survey_ht_total_audit",
    "asof_join_cogrouped",
    "doc_token_arrow_stats",
    "orders_column_profile",
    "events_hour_of_week_profile",
    "doc_script_mix",
    "text_stopword_profile",
    "events_zseason_weekday_lift",
    "part_brand_price_ladder",
    "orders_priority_mix_shift",
    "lineitem_quantity_mode_profile",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "multimodal_binary_meta",
    "multimodal_kind_catalog",
    "pipeline_declarative_demo",
    "statcan_vector_timeseries",
    "statcan_latest_revision",
    "upsert_orders_corrections",
    "scd2_user_daily_value",
    "statcan_pct_change_yoy",
    "statcan_rebase_index",
    "statcan_locf_gapfill",
    "dq_validation_report",
    "q21_waiting_suppliers",
    "q11_important_stock",
    "corr_price_quantity",
    "sample_hash_bucket",
    "window_navigation_events",
    "window_distribution_functions",
    "date_arithmetic_demo",
    "null_semantics_demo",
    "safe_cast_demo",
    "string_fuzzy_part_match",
    "string_functions_demo",
    "orders_by_quarter",
    "array_hof_user_digest",
    "grouping_sets_flags",
    "window_range_7day_revenue",
    "range_join_events_after_signup",
    "events_funnel_conversion",
    "histogram_order_values",
    "events_sliding_1h_15m",
    "setops_active_users",
    "rfm_segments",
    "events_hourly_anomalies",
    "basket_part_affinity",
    "events_dau_wau",
    "text_langid",
    "text_token_counts",
    "text_repetition_ratio",
    "corpus_top_words",
    "corpus_quality_filter",
    "corpus_vocab_stats",
    "embedding_norm_stats",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(ORACLES)
