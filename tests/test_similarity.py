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
