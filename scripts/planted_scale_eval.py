"""r13: run the REGISTERED planted-ANN helpers at sf1 (VERDICT r12
item 2's "Done" bar: the SCALING.md planted table reproduced by the
registered code path, not a parallel script implementation).

planted_recall_contract / planted_truth_profile are the exact
functions behind ann_planted_recall_contract /
ann_planted_truth_profile; this runner only re-points `planted_dir` at
testdata_big/sf1 (26k vectors, 9k truth pairs — generate with
`gen_testdata.py --sf 1 --planted-embeddings`) and adds wall-clock per
knob (timed one knob at a time so the numbers are comparable to the
r12 planted_spark_lsh_eval.py table).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from statcan_etl_pipeline_spark.queries.planted import (  # noqa: E402
    PLANTED_KNOBS,
    planted_recall_contract,
    planted_truth_profile,
)
from statcan_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(repo, "testdata_big", "sf1")
    if not os.path.exists(os.path.join(d, "embeddings_planted.parquet")):
        raise SystemExit("run scripts/gen_testdata.py --sf 1 --planted-embeddings first")
    spark = get_spark(app_name="planted_scale_eval")
    spark.sparkContext.setLogLevel("ERROR")
    print("truth profile (sf1 planted):")
    for r in planted_truth_profile(spark, d).collect():
        print("  ", r.asDict())
    print(f"{'knob':>7} {'secs':>7} {'cands':>10} {'verified':>9} {'recall':>8}")
    for knob in PLANTED_KNOBS:
        t0 = time.perf_counter()
        row = planted_recall_contract(spark, d, knobs=[knob]).collect()[0]
        secs = time.perf_counter() - t0
        print(
            f"{row['knob']:>7} {secs:>7.1f} {row['n_candidates']:>10,} "
            f"{row['n_verified']:>9,} "
            f"{row['n_truth_hits']}/{row['n_truth_pairs']} = {row['recall']:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
