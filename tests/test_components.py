"""Connected components vs a reference python union-find."""

from __future__ import annotations

from statcan_etl_pipeline_spark.operators.components import connected_components
from statcan_etl_pipeline_spark.registry import QUERIES


def _union_find(n_vertices, edges):
    parent = {v: v for v in n_vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in n_vertices}


def test_components_match_union_find_inline(spark):
    verts = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (6, 7)], "doc_a long, doc_b long"
    )
    got = {
        (r["vertex"], r["component"])
        for r in connected_components(verts, edges).collect()
    }
    ref = _union_find(range(8), [(0, 1), (1, 2), (3, 4), (6, 7)])
    assert got == set(ref.items())  # {0,1,2}->0, {3,4}->3, 5->5, {6,7}->6


def test_dedup_groups_match_union_find_on_real_pairs(spark, sf_small):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_small).collect()
    ]
    groups = {
        r["doc_id"]: r["group_rep"]
        for r in QUERIES["dedup_connected_groups"](spark, sf_small).collect()
    }
    ref = _union_find(list(groups.keys()), pairs)
    assert groups == ref


def test_star_components_match_union_find_random_graphs(spark):
    import random

    from statcan_etl_pipeline_spark.operators.components import (
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 45))
        ]
        verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        edf = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            (r["vertex"], r["component"])
            for r in connected_components_star(verts, edf).collect()
        }
        ref = _union_find(range(n), edges)
        assert got == set(ref.items()), f"trial {trial}: {sorted(got - set(ref.items()))}"


def test_star_components_converge_on_deep_chain(spark):
    """A 60-node chain has diameter 59: label propagation's default
    max_iter=20 cannot converge, but large-star/small-star needs only
    O(log^2 n) rounds — this is WHY the star formulation is the
    web-scale path."""
    import warnings as w

    from statcan_etl_pipeline_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    n = 60
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with w.catch_warnings():
        w.simplefilter("error")  # star must NOT warn (it converges)
        got = {
            (r["vertex"], r["component"])
            for r in connected_components_star(verts, chain).collect()
        }
    assert got == {(i, 0) for i in range(n)}
    # and the label-propagation formulation warns at its default budget
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        connected_components(verts, chain, max_iter=5).collect()
    assert any(issubclass(c.category, RuntimeWarning) for c in caught)
