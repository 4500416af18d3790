"""Property-based invariants for the dedup operators (hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from statcan_etl_pipeline_spark.operators.dedup import (
    exploded_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
)

_word = st.sampled_from(["data", "spark", "row", "scan", "fast", "slow", "join"])
_shingle = st.text(alphabet="abcde", min_size=5, max_size=5)
_doc = st.lists(_shingle, min_size=1, max_size=12, unique=True)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=2, max_size=6))
def test_jaccard_symmetric_bounded(spark, docs):
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    out = jaccard_pairs(exploded_shingles(df), threshold=0.0).collect()
    for r in out:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["common"] >= 1


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc)
def test_identical_docs_are_lsh_candidates(spark, shingles):
    df = spark.createDataFrame(
        [(0, shingles), (1, shingles)], "doc_id long, shingles array<string>"
    )
    sig = minhash_signature(exploded_shingles(df))
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sig).collect()}
    assert (0, 1) in pairs


def test_exact_dedup_idempotent(spark, sf_small):
    from statcan_etl_pipeline_spark.registry import QUERIES

    once = QUERIES["dedup_exact"](spark, sf_small)
    # applying the keep-first projection again changes nothing
    n_groups = once.count()
    assert once.select("fp").distinct().count() == n_groups
    total_docs = once.groupBy().sum("n_docs").collect()[0][0]
    from statcan_etl_pipeline_spark.catalog import load_table

    assert total_docs == load_table(spark, sf_small, "documents").count()
