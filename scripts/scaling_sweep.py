"""Empirical scaling sweep: measure the §6 scale-design claims.

Times representative query families at sf0.001 / sf0.01 / sf0.1 (100×
input growth end-to-end) and prints a markdown table plus one JSON
line. The informative number is the sf0.01→sf0.1 time ratio vs the 10×
data ratio: near-linear families should land well under ~10× (fixed
job overhead amortizes; partial aggregation and bucketed joins keep
work proportional), while the exact wedge enumeration is expected to
grow FASTER than input (its Σ C(d_z, 2) lower bound) — which is why it
carries a hub cap.

Usage: python scripts/scaling_sweep.py [--runs 2] [--out SCALING.md]
           [--testdata DIR] [--sfs sf0.001,sf0.01,sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from statcan_etl_pipeline_spark.registry import QUERIES  # noqa: E402

DEFAULT_SFS = "sf0.001,sf0.01,sf0.1"
DEFAULT_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

# query -> (family, driving table)
SWEEP = {
    "dedup_exact": ("dedup: exact hash groupBy (linear)", "documents"),
    "dedup_minhash_lsh": ("dedup: banded MinHash-LSH", "documents"),
    "dedup_ngram_jaccard": ("dedup: shingle inverted index + df cap", "documents"),
    "dedup_simhash": ("dedup: simhash band buckets", "documents"),
    "copurchase_part_similarity": (
        "graph: exact wedge enum (hub-capped, superlinear by design)",
        "lineitem",
    ),
    "gini_customer_revenue": ("rank: two-pass bucketed prefix sum", "orders"),
    "doc_global_shuffle": ("rank: two-pass global shuffle rank", "documents"),
    "customer_value_migration": ("rank: two-pass quartile migration", "orders"),
    "text_quality_score": ("text: pure column expressions (linear)", "documents"),
    "ann_ivf_cosine": ("ann: IVF bucketed candidates", "embeddings"),
    "doc_shingle_containment": (
        "dedup: containment w/ stop-shingle df cap",
        "documents",
    ),
    "kruskal_wallis_order_value": (
        "stats: rank test over DISTINCT-value window",
        "orders",
    ),
    "survey_jackknife_variance": ("survey: replicate-group aggregates", "orders"),
    "hll_mergeable_rollup": ("sketch: two-level HLL union rollup", "lineitem"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--testdata",
        default=DEFAULT_TESTDATA,
        help="root dir holding the sf*/ parquet layouts "
        "(default $SPARK_GRAFT_TESTDATA or /root/testdata)",
    )
    ap.add_argument(
        "--sfs",
        default=DEFAULT_SFS,
        help="comma-separated sf dir names, smallest first",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the sweep queries to run",
    )
    args = ap.parse_args()
    TESTDATA = args.testdata
    SFS = args.sfs.split(",")
    if args.queries is not None:
        requested = args.queries.split(",")
        unknown = [q for q in requested if q not in SWEEP]
        if unknown:
            ap.error(
                f"unknown --queries names: {unknown}; "
                f"valid: {sorted(SWEEP)}"
            )
        sweep = {k: v for k, v in SWEEP.items() if k in requested}
    else:
        sweep = dict(SWEEP)

    from statcan_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scaling_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    rows = {
        sf: {
            t: spark.read.parquet(f"{TESTDATA}/{sf}/{t}.parquet").count()
            for t in {tab for _, tab in sweep.values()}
        }
        for sf in SFS
    }

    results: dict[str, dict[str, float]] = {}
    for name in sweep:
        results[name] = {}
        for sf in SFS:
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, f"{TESTDATA}/{sf}").collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][sf] = round(best, 3)
            print(f"  {name} @ {sf}: {results[name][sf]} s", file=sys.stderr)

    lo, hi = SFS[0], SFS[-1]
    has_ratio = len(SFS) >= 2
    t_cols = " | ".join(f"t({sf})" for sf in SFS)
    ratio_hdr = f" t ratio {SFS[-2]}→{hi} |" if has_ratio else ""
    lines = [
        f"| query | family | driving rows {lo}→{hi} | {t_cols} |{ratio_hdr}",
        "|---" * (3 + len(SFS) + int(has_ratio)) + "|",
    ]
    for name, (family, tab) in sweep.items():
        r = results[name]
        times = " | ".join(f"{r[sf]:.2f} s" for sf in SFS)
        if has_ratio:
            ratio = r[hi] / r[SFS[-2]] if r[SFS[-2]] else float("nan")
            ratio_cell = f" **{ratio:.1f}×** |"
        else:
            ratio_cell = ""
        lines.append(
            f"| `{name}` | {family} | {rows[lo][tab]:,}→{rows[hi][tab]:,}"
            f" | {times} |{ratio_cell}"
        )
    table = "\n".join(lines)
    print(table)
    print(json.dumps({"results": results, "rows": rows}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
