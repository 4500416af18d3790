"""Executed-plan metric profiling + shuffle-budget pins.

String plan assertions (test_plans.py) pin the SHAPE; these pin the
measured behavior: how many exchanges actually ran and how much data
crossed them. A refactor that silently adds a shuffle to a headline
query fails here before it fails on a cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from statcan_etl_pipeline_spark.plans.metrics import execution_metrics, profile
from statcan_etl_pipeline_spark.registry import QUERIES


def test_profile_distinguishes_broadcast_from_shuffle_join(spark):
    big = spark.range(200_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    small = spark.range(50).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    bj = big.join(F.broadcast(small), "k")
    p_b = profile(bj)
    assert p_b["n_exchanges"] == 0 and p_b["shuffle_bytes"] == 0
    assert p_b["n_broadcasts"] == 1
    assert p_b["scan_rows"] == 0  # range source, no file scans

    agg = big.groupBy((F.col("k") % 13).alias("g")).agg(F.sum("v"))
    p_a = profile(agg)
    assert p_a["n_exchanges"] >= 1 and p_a["shuffle_bytes"] > 0
    # map-side partial agg: far fewer records cross the wire than rows in
    assert 0 < p_a["shuffle_records"] < 200_000 / 10
    assert p_a["spill_bytes"] == 0


def test_profile_sees_through_aqe_wrappers(spark):
    df = spark.range(10_000).groupBy((F.col("id") % 3).alias("g")).count()
    df.collect()
    classes = {cls for cls, _, _ in execution_metrics(df)}
    assert "ShuffleExchangeExec" in classes  # hidden behind AQE stages
    assert "HashAggregateExec" in classes


def test_shuffle_budget_headline_queries(spark, sf_small):
    """Exchange-count budgets for headline queries. Budgets are the
    MEASURED counts at the time the plan was tuned — a higher count
    means a shuffle crept in; lower is a pleasant surprise (tighten)."""
    budgets = {
        # scan → partial agg → 1 exchange → final agg, + the range
        # exchange of the 4-row output sort
        "q1_pricing_summary": 2,
        # per-user window sessionization: 1 exchange on user_id (reused
        # by the session agg — same partitioning) + tiny output sort
        "sessionize_events": 2,
        # exact dedup: md5-fingerprint groupBy + keep-first resolve
        "dedup_exact": 2,
        # banded LSH: explode/partial-min sig agg + band self-join +
        # pair distinct
        "dedup_minhash_lsh": 4,
        # containment: shingle distinct + df filter + pair agg + two
        # size joins + output sort (measured 6; the df cap keeps
        # shuffle_bytes pair-bounded, asserted below)
        "doc_shingle_containment": 6,
        # two-level sketch rollup: cell agg + union agg + exact
        # distinct (2-phase) + join — the union stage moves sketches,
        # not rows
        "hll_mergeable_rollup": 5,
    }
    for name, budget in budgets.items():
        df = QUERIES[name](spark, sf_small)
        got = profile(df)["n_exchanges"]
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"


def test_lpa_edges_shuffle_once_not_per_round(spark, sf_small):
    """part_label_propagation_communities runs 4 synchronized rounds,
    each joining the edge table against the label state. r14: the edge
    table is materialized ONCE via a lazy localCheckpoint and rounds
    1..3's label state is checkpointed too, so the visible (last-round)
    plan reads checkpoint scans — the edge build (lineitem self-join)
    appears in NO round's consumer plan, and the label state enters the
    edge side as a broadcast, never a shuffle of edges. Pin the
    truncated shape and the executed-exchange budget of the final
    segment (label-side aggregates only)."""
    df = QUERIES["part_label_propagation_communities"](spark, sf_small)
    p = profile(df)
    # final segment: nb groupBy + pick groupBy + output agg/sort —
    # the edge exchange is paid once inside the checkpoint build, not
    # here, and never per round
    assert p["n_exchanges"] <= 6, p
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "edges/labels must come from checkpoints"
    assert "BroadcastHashJoin" in plan, "label state must broadcast into edges"
    assert "lineitem" not in plan, "edge build must not be re-derived per round"
