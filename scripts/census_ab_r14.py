"""r14 interleaved A/B: old banding shape (minhash_signature →
band_keys, 192 mh columns through the struct-array explode) vs the new
slim agg-time banding (_sim_banded_index) for the two copurchase
queries, at one SF in one session.

The old shape is reconstructed here from the still-shipped public
operators (minhash_signature + band_keys + lsh_*_from_index) — it is
bit-identical to the r13 registered plan. Interleaved rep-major
(old census, new census, old sim, new sim) × REPS; min-of-reps is the
level, ratios are the measurement (SCALING.md ambient discipline).

Usage: python scripts/census_ab_r14.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import statcan_etl_pipeline_spark.registry  # noqa: F401,E402  (load order)
from statcan_etl_pipeline_spark.operators.dedup import (  # noqa: E402
    band_keys,
    lsh_census_from_index,
    lsh_pairs_from_index,
    minhash_signature,
)
from statcan_etl_pipeline_spark.queries.analytics3 import (  # noqa: E402
    _SIM_BAND_ROWS,
    _SIM_BUCKET_CAP,
    _SIM_HUB_CAP,
    _SIM_N_HASHES,
    _copurchase_edges,
    _copurchase_degrees,
    _sim_banded_index,
)
from statcan_etl_pipeline_spark.session import get_spark  # noqa: E402


def _shingled(spark, sf_dir):
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = _copurchase_degrees(edges).localCheckpoint(eager=False)
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    small = adj.join(deg.filter(F.col("d") <= _SIM_HUB_CAP).select("node"), "node")
    return small.select(
        F.col("nbr").alias("doc_id"), F.col("node").cast("string").alias("sh")
    )


def census_old(spark, sf_dir):
    sig = minhash_signature(_shingled(spark, sf_dir), _SIM_N_HASHES)
    return lsh_census_from_index(
        band_keys(sig, _SIM_N_HASHES, _SIM_BAND_ROWS), _SIM_BUCKET_CAP
    ).orderBy("bucket_size")


def census_new(spark, sf_dir):
    return lsh_census_from_index(
        _sim_banded_index(_shingled(spark, sf_dir), _SIM_N_HASHES, _SIM_BAND_ROWS),
        _SIM_BUCKET_CAP,
    ).orderBy("bucket_size")


def pairs_old(spark, sf_dir):
    sig = minhash_signature(_shingled(spark, sf_dir), _SIM_N_HASHES)
    return lsh_pairs_from_index(
        band_keys(sig, _SIM_N_HASHES, _SIM_BAND_ROWS), _SIM_BUCKET_CAP
    )


def pairs_new(spark, sf_dir):
    return lsh_pairs_from_index(
        _sim_banded_index(_shingled(spark, sf_dir), _SIM_N_HASHES, _SIM_BAND_ROWS),
        _SIM_BUCKET_CAP,
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="census-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "census_old": census_old,
        "census_new": census_new,
        "pairs_old": pairs_old,
        "pairs_new": pairs_new,
    }
    times = {k: [] for k in variants}
    counts = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 2))
            counts[name] = n
            print(f"rep{rep} {name}: {dt:.2f}s rows={n}", flush=True)
    print("---")
    for name in variants:
        print(
            f"{name}: min {min(times[name]):.2f}s reps {times[name]} "
            f"rows={counts[name]}"
        )
    # counts are NOT asserted equal: the r14 KM hash family legitimately
    # shifts bucket membership, so candidate/census counts differ
    # slightly from the r13 md5-string family (both printed above).
    spark.stop()


if __name__ == "__main__":
    main()
