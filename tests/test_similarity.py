"""Structural checks for the ANN path (rows-only in the driver):
bucket containment, cosine agreement with brute force, rank ordering."""

from __future__ import annotations

from statcan_etl_pipeline_spark.registry import QUERIES


def test_ann_results_subset_of_bruteforce_cosines(spark, sf_small):
    ann = QUERIES["ann_lsh_cosine"](spark, sf_small).collect()
    assert len(ann) > 0, "4-bit LSH over 500 vectors must produce some candidates"
    brute = QUERIES["knn_bruteforce_cosine"](spark, sf_small).collect()
    brute_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_cos:  # same pair → identical cosine value
            assert r["cosine"] == brute_cos[key]


def test_ann_ranks_are_dense_and_ordered(spark, sf_small):
    ann = QUERIES["ann_lsh_cosine"](spark, sf_small).collect()
    by_q: dict[int, list] = {}
    for r in ann:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        # all candidates share the query's bucket
        assert len({r["bucket"] for r in rows}) == 1


def test_ivf_results_structurally_sound(spark, sf_small):
    ann = QUERIES["ann_ivf_cosine"](spark, sf_small).collect()
    assert len(ann) > 0
    brute = QUERIES["knn_bruteforce_cosine"](spark, sf_small).collect()
    brute_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_cos:
            assert r["cosine"] == brute_cos[key]
    # each query returns at most TOP_K per probed arrangement and ranks are dense
    by_q = {}
    for r in ann:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pq_encode_is_deterministic_and_bounded(spark, sf_small):
    from statcan_etl_pipeline_spark.catalog import load_table
    from statcan_etl_pipeline_spark.queries.similarity import PQ_K, PQ_M, pq_encode

    emb = load_table(spark, sf_small, "embeddings")
    codes = pq_encode(emb).select(
        "vec_id", *[f"code_{m}" for m in range(PQ_M)]
    )
    rows = codes.orderBy("vec_id").collect()
    for r in rows:
        for m in range(PQ_M):
            assert 0 <= r[f"code_{m}"] < PQ_K
    assert rows == pq_encode(emb).select(
        "vec_id", *[f"code_{m}" for m in range(PQ_M)]
    ).orderBy("vec_id").collect()


def test_pq_roundtrip_exact_on_centroid_vectors(spark):
    """A vector that IS a codebook centroid concatenation must encode to
    those codes and decode back to itself exactly."""
    from statcan_etl_pipeline_spark.queries.similarity import (
        PQ_M,
        _pq_codebook,
        pq_decode,
        pq_encode,
    )

    want_codes = [3, 0, 7, 5]
    vec = []
    for m, k in enumerate(want_codes):
        vec.extend(_pq_codebook(m)[k])
    df = spark.createDataFrame([(1, vec)], "vec_id bigint, embedding array<double>")
    out = pq_decode(pq_encode(df)).collect()[0]
    assert [out[f"code_{m}"] for m in range(PQ_M)] == want_codes
    assert out["reconstructed"] == vec


def test_ann_pq_shape_and_rank_contract(spark, sf_small):
    from statcan_etl_pipeline_spark.registry import QUERIES

    out = QUERIES["ann_pq_cosine"](spark, sf_small).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ranks = [r["rank"] for r in rows]
        assert ranks == list(range(1, len(ranks) + 1))
        cosines = [r["approx_cosine"] for r in rows]
        assert all(-1.0 <= c <= 1.0 for c in cosines)
        assert cosines == sorted(cosines, reverse=True)
