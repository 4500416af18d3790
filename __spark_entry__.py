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
    # --- ROUND 13 WINDOW (VERDICT r12 item 1). Positions 0-4: the five
    # r5-verified queries deferred from the r12 rotation — the stalest
    # block (freshness ledger computed programmatically from
    # CORRECTNESS_r01..r12: r5×5, r6×39, r8×45, r9×43, r10×48, r11×47,
    # r12×50). ---
    "events_variant_stats",
    "pipe_syntax_priority_summary",
    "udtf_token_positions",
    "group_by_all_revenue",
    "statcan_seasonal_decompose",
    # --- Positions 5-10: this round's changed + new queries
    # (scripts/check_window.py enforces in-window). Changed:
    # copurchase_part_similarity + copurchase_band_census (r13 OR-
    # amplification decision, VERDICT item 3 — see analytics3.py),
    # part_kcore_decomposition (published fixed-12 contract docstring +
    # the _free_local_checkpoint debug log, VERDICT item 4 + ADVICE),
    # dedup_embedding_cosine (count-probe comment reword, ADVICE).
    # New: the planted-regime ANN family (VERDICT item 2) —
    # ann_planted_recall_contract + ann_planted_truth_profile over the
    # committed testdata_planted/sf0.01 calibration fixture. ---
    "copurchase_part_similarity",
    "copurchase_band_census",
    "part_kcore_decomposition",
    "dedup_embedding_cosine",
    "ann_planted_recall_contract",
    "ann_planted_truth_profile",
    # --- Positions 11-49: the 39 queries last driver-verified in
    # ROUND 6 — the rest of the staleness tail; after this round the
    # freshness floor moves to r8. ---
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
    # --- everything below position 50 is driver-green from r8-r12;
    # next-stalest first so future rotations read top-down: the r8
    # block (45 queries — r14 window material, positions 50-94). ---
    "approx_distinct_parts_by_flag",
    "approx_quantiles_order_value",
    "asof_join_cogrouped",
    "bom_explosion_recursive",
    "business_day_ship_latency",
    "collated_segment_rollup",
    "corpus_cross_source_overlap",
    "customer_value_migration",
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
    "stratified_sample_exact",
    "survey_ht_total_audit",
    "text_stopword_profile",
    "user_weekly_survival",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {k: QUERIES[k] for k in _CHECK_FIRST if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(ORACLES)
