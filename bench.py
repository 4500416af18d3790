"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 10, VERDICT r9 items 2-3): each query runs REPS=3
times and the recorded per-query number is the MIN of the reps — the
single-shot timing used through r9 measured JIT/codegen warm-up and
ambient machine noise (three identical r9 runs spanned 31.4-38.7 s,
±12% on unchanged plans; SCALING.md). The min is the most stable
plan-cost estimator on a quiet-ish machine; the max-min spread is
recorded per query (`spread`) plus per-rep totals (`rep_totals`) so
round-over-round comparisons can see what was noise. `value` remains
the sum over headliners for continuity, now of per-query mins.

A second family, LLM_PIPELINE, benches the graded LLM-data-pipeline
operators (ANN, embedding-LSH dedup, connected components, incremental
dedup, BM25, quality filter) as `llm_pipeline_total` so their perf
regressions are visible round-over-round.
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

LLM_PIPELINE = [
    "dedup_embedding_lsh",
    "ann_ivfpq_cosine",
    "dedup_connected_groups",
    "dedup_incremental_delta",
    "doc_bm25_search",
    "corpus_quality_filter",
]

# Third family (round 11 continuation): the iterative/graph operators,
# benched as `graph_pipeline_total` — triangles, k-core, PageRank and
# LPA all iterate over the shared co-purchase graph and carry the
# round-11 plan rewrites (canonical wedge close, shrinking-set peel);
# without a bench family their regressions were invisible between
# rounds (the sf1 census caught copurchase_part_similarity only by
# sweeping the whole registry).
GRAPH_PIPELINE = [
    "part_copurchase_triangles",
    "part_kcore_decomposition",
    "graph_pagerank",
    "part_label_propagation_communities",
]

# Fourth family (round 12): the banded set-similarity path. Kept
# SEPARATE from graph_pipeline_total so that family's r11 baseline
# stays comparable; first recording in BENCH_r12. The r12 rewrite cut
# copurchase_part_similarity 34.2 -> 12.9 s at sf0.1 (370 -> 39 s at
# sf1, SCALING.md) — this family makes any drift back toward the wedge
# regime visible between rounds.
# r13 NOTE: expect this family's totals to RISE vs BENCH_r12 — the
# band count was deliberately raised 24 -> 96 (x4 minhash term,
# measured x1.39 at sf0.1) to buy sf0.01 recall 0.25 -> 0.705 vs the
# exact wedge twin (VERDICT r12 item 3; curve + adoption rationale in
# SCALING.md "Round 13"). A deliberate, documented recall buy — not
# drift; the wedge regime (14.7M candidate pairs) remains 33x away.
SIM_PIPELINE = [
    "copurchase_part_similarity",
    "copurchase_band_census",
]

REPS = 3


def _run(spark, name: str, sf_dir: str) -> None:
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()


def _bench_family(spark, names: list[str], sf_dir: str):
    """(per-query min, per-query max-min spread, per-rep totals).

    Rep-major order (all queries once, then again) so rep 0 absorbs
    each plan's codegen compile and reps 1-2 measure steady state."""
    reps: list[dict[str, float]] = []
    for _ in range(REPS):
        t: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            _run(spark, name, sf_dir)
            t[name] = time.perf_counter() - t0
        reps.append(t)
    mins = {n: round(min(r[n] for r in reps), 3) for n in names}
    spread = {n: round(max(r[n] for r in reps) - min(r[n] for r in reps), 3)
              for n in names}
    rep_totals = [round(sum(r.values()), 3) for r in reps]
    return mins, spread, rep_totals


def _stdout_payload(timings, llm_t, g_t, s_t, rep_totals, sf):
    """The SINGLE stdout JSON line — per-query maps first, totals LAST,
    spreads/rep-detail on stderr only. r13 (VERDICT r12 item 5): the
    driver records a 2000-char tail of stdout; the r12 line packed four
    families' per-query spreads + rep totals into one ~4 KB object, so
    the tail cut `headline_queries_total` and `parsed` came back null.
    This payload is size-tested (tests/test_plans.py) to stay < 1900
    chars so the whole line survives the tail AND parses; and because a
    tail keeps the END of an overlong line, the per-query maps come
    FIRST and every total comes LAST — if the line ever grows past the
    tail again, what gets cut is a map prefix, never the totals."""
    return {
        "queries": timings,
        "llm_queries": llm_t,
        "graph_queries": g_t,
        "sim_queries": s_t,
        "reps": REPS,
        "rep_totals": rep_totals,
        "sf": sf,
        "llm_pipeline_total": round(sum(llm_t.values()), 3),
        "graph_pipeline_total": round(sum(g_t.values()), 3),
        "sim_pipeline_total": round(sum(s_t.values()), 3),
        "metric": "headline_queries_total",
        "unit": "sec",
        "value": round(sum(timings.values()), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    head = [n for n in HEADLINE if n in QUERIES]
    llm = [n for n in LLM_PIPELINE if n in QUERIES]
    graph = [n for n in GRAPH_PIPELINE if n in QUERIES]
    sim = [n for n in SIM_PIPELINE if n in QUERIES]
    # warm the JVM + parquet footers once so rep 0 measures the plan,
    # not session startup
    _run(spark, head[0], sf_dir)
    timings, spread, rep_totals = _bench_family(spark, head, sf_dir)
    llm_t, llm_spread, llm_rep_totals = _bench_family(spark, llm, sf_dir)
    g_t, g_spread, g_rep_totals = _bench_family(spark, graph, sf_dir)
    s_t, s_spread, s_rep_totals = _bench_family(spark, sim, sf_dir)
    sf_s = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_s) if sf_s.replace(".", "").isdigit() else sf_s
    # spreads + per-family rep totals are measurement PROVENANCE, not
    # the headline record — stderr, where the driver's stdout tail
    # can't truncate the totals
    print(
        json.dumps(
            {
                "spread": spread,
                "llm_spread": llm_spread,
                "llm_rep_totals": llm_rep_totals,
                "graph_spread": g_spread,
                "graph_rep_totals": g_rep_totals,
                "sim_spread": s_spread,
                "sim_rep_totals": s_rep_totals,
            }
        ),
        file=sys.stderr,
    )
    print(json.dumps(_stdout_payload(timings, llm_t, g_t, s_t, rep_totals, sf)))
    spark.stop()


if __name__ == "__main__":
    main()
