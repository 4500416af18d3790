"""r13: the planted-regime ANN calibration family (VERDICT r12 item 2).

Driver-hash parity is covered by test_parity's auto-parametrization
(both queries carry full DuckDB oracles over the committed fixture);
these tests pin the CONTRACT the registration exists to state — the
knob trade-off measured at sf1 in r12 must hold on the fixture, the
planted cosine floor must match the corrected ADVICE claim, and the
helpers must stay dir-parameterized so the sf1 scaling runner shares
the registered code path.
"""

from __future__ import annotations

import os

import pytest

from statcan_etl_pipeline_spark.queries.planted import (
    GATE_PLANTED_DIR,
    planted_recall_contract,
    planted_truth_profile,
)
from statcan_etl_pipeline_spark.registry import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_planted_fixture_is_committed():
    """The oracle reads the fixture by absolute path — if the parquet
    files fall out of the tree (e.g. a .gitignore change), every driver
    row of the family goes red. Fail fast and locally instead."""
    for f in ("embeddings_planted.parquet", "embeddings_planted_truth.parquet"):
        assert os.path.exists(os.path.join(GATE_PLANTED_DIR, f)), f
    # and it must not be ignored: generated once, committed, never
    # silently regenerated (the truth hashes are baked into the oracle
    # evidence)
    gi = open(os.path.join(REPO, ".gitignore")).read()
    assert "testdata_planted" not in gi


def test_planted_fixture_bytes_are_pinned():
    """The fixture is generated ONCE and committed; the driver hashes
    of the whole planted family are evidence about exactly these bytes.
    A silent regeneration (different numpy/pyarrow version, tweaked
    seed) would shift the ground truth between window rotations while
    every green row kept pointing at the old corpus — so the committed
    parquet md5s are pinned here. If you regenerate DELIBERATELY,
    update these pins in the same commit and rotate the family back
    into the driver window."""
    import hashlib

    pins = {
        "sf0.001/embeddings_planted.parquet":
            "2f3b6a4dc37fd7e5d4611b08823bbb79",
        "sf0.001/embeddings_planted_truth.parquet":
            "16ba70681892782889c5ccd2e60b25fc",
        "sf0.01/embeddings_planted.parquet":
            "a3f9f1c333c576dc27e0e016a9529b17",
        # identical to sf0.001's: both plant on a 500-vector base, so
        # cluster count and seeds coincide — expected, not a bug
        "sf0.01/embeddings_planted_truth.parquet":
            "16ba70681892782889c5ccd2e60b25fc",
        "sf0.1/embeddings_planted.parquet":
            "e16868edffbfce7871f029b390f94434",
        "sf0.1/embeddings_planted_truth.parquet":
            "68361478c13c8cf6b7d07850e78c1fb8",
    }
    root = os.path.join(REPO, "testdata_planted")
    for rel, want in pins.items():
        got = hashlib.md5(open(os.path.join(root, rel), "rb").read()).hexdigest()
        assert got == want, f"{rel}: fixture bytes drifted ({got})"


def _by_knob(df):
    return {r["knob"]: r.asDict() for r in df.collect()}


def test_planted_knob_tradeoff(spark):
    """The registered contract: the (4,8) knob must cut candidate mass
    ≥5× vs the registered (3,4) default while holding recall ≥0.75 on
    planted high-cosine truth, and (3,4) must keep recall ≥0.90 —
    the fixture-scale statement of the r12 sf1 measurement (5.6×
    wall-clock at 0.81 vs 0.92 recall). Measured at the fixture:
    34,715 vs 3,651 candidates (9.5×), recall 0.9167 vs 0.7722."""
    rows = _by_knob(QUERIES["ann_planted_recall_contract"](spark, GATE_PLANTED_DIR))
    a, b = rows["T3_p4"], rows["T4_p8"]
    assert a["n_truth_pairs"] == b["n_truth_pairs"] == 180
    assert a["recall"] >= 0.90, a
    assert b["recall"] >= 0.75, b
    assert a["recall"] > b["recall"]
    assert b["n_candidates"] * 5 <= a["n_candidates"], (a, b)
    # every planted truth pair sits far above the τ=0.4 verify, so a
    # candidate truth pair is always verified
    assert a["n_truth_hits"] <= a["n_verified"]
    assert b["n_truth_hits"] <= b["n_verified"]


def test_planted_truth_floor(spark):
    """The corrected ADVICE claim as a registered fact: dup-dup pairs
    sit at ≈ c² ± noise, so the c=0.90 tier's floor is ≈0.77 (not the
    old 'all ≥ 0.80' claim) — and every tier stays above 0.7, which is
    what makes recall a pure candidate-generation measure (τ=0.4 never
    rejects a truth pair)."""
    rows = {r["tier"]: r.asDict() for r in
            planted_truth_profile(spark, GATE_PLANTED_DIR).collect()}
    assert sorted(rows) == [0, 1, 2]
    for tier, target in ((0, 0.90), (1, 0.95), (2, 0.99)):
        r = rows[tier]
        assert r["n_pairs"] == 60
        assert r["target_cosine"] == pytest.approx(target)
        # seed-dup pairs sit exactly at the target (fixed-point rounded)
        assert r["max_cosine"] == pytest.approx(target, abs=1e-6)
        assert r["min_cosine"] >= 0.7
        assert r["min_cosine"] < r["avg_cosine"] < r["max_cosine"]
    # tier 0's floor is genuinely below the old 0.80 claim
    assert rows[0]["min_cosine"] < 0.80


def test_planted_helper_is_dir_parameterized(spark):
    """The sf1 scaling runner points the SAME helper at
    testdata_big/sf1 — prove the dir parameter works by running the
    contract on the committed sf0.1 fixture (2,600 vectors, 900 truth
    pairs) and checking the knob ordering holds there too."""
    d = os.path.join(REPO, "testdata_planted", "sf0.1")
    rows = _by_knob(planted_recall_contract(spark, d))
    a, b = rows["T3_p4"], rows["T4_p8"]
    assert a["n_truth_pairs"] == 900
    assert a["recall"] > b["recall"] >= 0.75
    assert b["n_candidates"] * 5 <= a["n_candidates"]


def test_planted_contract_plan_is_banded(spark):
    """No cartesian/all-pairs anywhere: candidates come from the banded
    (t, bucket) equi-join; the only nested-loop joins are the 1-row
    aggregate crossJoins (the k-core summary precedent)."""
    df = QUERIES["ann_planted_recall_contract"](spark, GATE_PLANTED_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lsh_candidates_or_amplification_is_monotone(spark):
    """Structural contract of OR-amplification: a pair is a candidate
    if ANY table buckets it together, so adding a table (same prefixes
    for the shared ones) can only ADD candidates — candidates(T=3,p)
    must contain candidates(T=2,p) and so on. Checked on the committed
    sf0.001 fixture at p=8 (small buckets, so the containment is not
    vacuous)."""
    from statcan_etl_pipeline_spark.queries.planted import (
        _lsh_candidates,
        _planted,
    )

    emb = _planted(spark, os.path.join(REPO, "testdata_planted", "sf0.001"))
    sets = []
    for n_tables in (1, 2, 3):
        rows = _lsh_candidates(emb, n_tables, 8).collect()
        pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
        assert len(pairs) == len(rows), "candidate pairs not distinct"
        assert all(a < b for a, b in pairs), "pair orientation violated"
        sets.append(pairs)
    assert sets[0] <= sets[1] <= sets[2], (
        len(sets[0]), len(sets[1]), len(sets[2]))
    # and it must not be vacuous: each extra table finds something new
    # on this fixture (measured: strictly growing)
    assert len(sets[0]) < len(sets[2])
