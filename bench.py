"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from statcan_etl_pipeline_spark.registry import QUERIES  # noqa: E402
from statcan_etl_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_orders",
    "agg_rollup_sales",
    "window_top3_parts_per_supplier",
    "topk_customers_by_revenue",
    "sessionize_events",
    "events_tumbling_1h",
    "text_quality_score",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "asof_join_purchase_to_view",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "dq_validation_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not session startup
    QUERIES[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
