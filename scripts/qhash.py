"""Ad-hoc query result fingerprinter: run named queries at a given SF
and print wall time + row count + an order/column-order-insensitive
value hash (the same idea as the driver compare). For before/after
bit-identity checks during perf work.

Usage: python scripts/qhash.py q1 q2 ... [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from statcan_etl_pipeline_spark.registry import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("qhash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        for rep in range(args.runs):
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            rows = df.collect()
            dt = time.time() - t0
            cols = sorted(df.columns)
            h = hashlib.md5()
            for r in sorted(
                tuple(repr(r[c]) for c in cols) for r in rows
            ):
                h.update(";".join(r).encode())
            print(
                f"{name} rep{rep}: {dt:7.2f}s rows={len(rows)} "
                f"hash={h.hexdigest()[:16]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
