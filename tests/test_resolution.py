"""Entity-resolution (FastSS) operator tests + behavior checks for the
round-6 batch-2 queries (survival curve, EWMA fold)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from statcan_etl_pipeline_spark.operators.resolution import fastss_pairs
from statcan_etl_pipeline_spark.registry import QUERIES


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fastss_complete_for_distance_one(spark):
    """Deletion-neighborhood blocking loses NO pair at distance ≤ 1:
    equality with the brute-force quadratic definition on a name set
    covering substitutions, insertions, deletions, repeats, and
    far-apart strings."""
    names = [
        "alpha", "alpho",          # substitution
        "alphaa", "alph",          # insertion / deletion vs "alpha"
        "aaaa", "aaa",             # repeated chars (dup variants)
        "beta", "betb", "btea",    # transposition is distance 2 — excluded
        "gamma", "delta",          # unrelated
        "x", "y", "",              # tiny strings; "" only matches 1-char
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rid int, rname string"
    )
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fastss_pairs(df, "rid", "rname", max_dist=1).collect()
    }
    want = {
        (i, j, _lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if _lev(names[i], names[j]) <= 1
    }
    assert got == want and len(want) >= 6
    # transposition really is excluded (distance 2)
    assert not any(names[a] == "beta" and names[b] == "btea" for a, b, _ in got)


def test_fastss_plan_no_cartesian(spark):
    df = spark.range(200).select(
        F.col("id").alias("rid"), F.format_string("name%05d", "id").alias("rname")
    )
    plan = fastss_pairs(df, "rid", "rname")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_survival_curve_shape(spark, sf_small):
    rows = QUERIES["user_weekly_survival"](spark, sf_small).collect()
    assert rows[0]["week_offset"] == 0
    # week 0 includes every user; the curve is non-increasing
    surv = [r["surviving"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert abs(rows[0]["survival_rate"] - 1.0) < 1e-9


def test_ewma_fold_matches_hand_computation(spark, tmp_path):
    """alpha=0.5 fold: e0=x0, e_t = 0.5*e_{t-1} + 0.5*x_t."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, d, 12, 0), 7, "click", 1.0, "{}")
        for d in (1, 1, 2, 3)  # daily counts: 2, 1, 1
    ]
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(src)
    got = {
        (r["day"], r["daily_n"], r["ewma"])
        for r in QUERIES["events_ewma_daily"](spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", 2, 2.0),
        ("2024-01-02", 1, 1.5),   # 0.5*2 + 0.5*1
        ("2024-01-03", 1, 1.25),  # 0.5*1.5 + 0.5*1
    }
