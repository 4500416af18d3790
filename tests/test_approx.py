"""Error bounds for the approximate aggregates vs exact answers."""

from __future__ import annotations

from statcan_etl_pipeline_spark.registry import QUERIES


def test_approx_distinct_within_rsd(spark, sf_med):
    """The audit query's verdict booleans must hold, AND the raw HLL++
    estimates (recomputed here) must sit inside the looser 10% band."""
    import pyspark.sql.functions as F

    from statcan_etl_pipeline_spark.catalog import load_table

    for r in QUERIES["approx_distinct_parts_by_flag"](spark, sf_med).collect():
        assert r["parts_within_band"] and r["orders_within_band"], dict(r.asDict())
        assert r["exact_parts"] > 0 and r["exact_orders"] > 0

    approx = {
        r["l_returnflag"]: (r["ap"], r["ao"])
        for r in load_table(spark, sf_med, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: (r["p"], r["o"])
        for r in load_table(spark, sf_med, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o"))
        .collect()
    }
    for flag, (ap, ao) in approx.items():
        ep, eo = exact[flag]
        assert abs(ap - ep) / ep < 0.10, (flag, ap, ep)
        assert abs(ao - eo) / eo < 0.10, (flag, ao, eo)


def test_approx_quantiles_close_to_exact(spark, sf_med):
    """Verdict booleans must hold, and the exact discrete percentiles
    the audit emits must track percentiles_order_value's continuous
    ones within 2% (they use different percentile definitions, so exact
    equality is not expected)."""
    audit = {
        r["c_mktsegment"]: r
        for r in QUERIES["approx_quantiles_order_value"](spark, sf_med).collect()
    }
    exact = {
        r["c_mktsegment"]: (r["p50"], r["p90"])
        for r in QUERIES["percentiles_order_value"](spark, sf_med).collect()
    }
    assert audit
    for seg, r in audit.items():
        assert r["p50_within_band"] and r["p90_within_band"], dict(r.asDict())
        e50, e90 = exact[seg]
        assert abs(r["exact_p50"] - e50) / e50 < 0.02, (seg, r["exact_p50"], e50)
        assert abs(r["exact_p90"] - e90) / e90 < 0.02, (seg, r["exact_p90"], e90)


def test_cms_overestimates_with_bounded_error(spark, sf_med):
    """Count-min guarantee: estimate >= exact for every key, and with
    d=4 rows x w=256 buckets the expected overshoot is N/w per row —
    taking the min over 4 independent rows keeps it small on a
    31-word vocabulary."""
    from statcan_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["cms_word_frequency"](spark, sf_med).collect()
    assert len(rows) > 0
    n_total = sum(r["exact_n"] for r in rows)
    for r in rows:
        assert r["cms_n"] >= r["exact_n"], r
        # overshoot bounded by ~2·N/w with high probability
        assert r["cms_n"] - r["exact_n"] <= max(2 * n_total // 256, 50), r


def test_kmv_estimate_within_error_bound(spark, sf_med):
    """KMV with k=64 has relative stderr ~1/sqrt(k-2) ~ 13%; assert the
    deterministic estimate lands within 3-sigma of exact."""
    from statcan_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["kmv_distinct_parts"](spark, sf_med).collect()
    assert len(rows) > 0
    for r in rows:
        rel_err = abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel_err <= 0.40, (r, rel_err)


def test_hll_merged_rollup_tracks_direct_sketch(spark, sf_med):
    """Mergeability contract: the two-level rollup (cell sketches →
    hll_union_agg) must land within 2% of the single-pass sketch and
    within the published 6% band of exact — the invariant that lets a
    100 TB pipeline answer rollups from stored sketches without
    re-scanning facts."""
    import pyspark.sql.functions as F

    from statcan_etl_pipeline_spark.catalog import load_table
    from statcan_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["hll_mergeable_rollup"](spark, sf_med).collect()
    assert rows and all(r["merged_within_band"] for r in rows)
    li = load_table(spark, sf_med, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = {
        r["l_returnflag"]: r["est"]
        for r in cells.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est"))
        .collect()
    }
    direct = {
        r["l_returnflag"]: r["est"]
        for r in li.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).cast("long").alias("est"))
        .collect()
    }
    for flag, est in merged.items():
        assert abs(est - direct[flag]) <= max(direct[flag] * 2 // 100, 2), (
            flag, est, direct[flag],
        )
