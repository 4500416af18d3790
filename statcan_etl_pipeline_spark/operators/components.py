"""Connected components over dedup candidate pairs.

A dedup pipeline needs GROUPS, not pairs: if A~B and B~C, then {A,B,C}
dedupes to one keeper. This is connected components, computed by
iterative minimum-label propagation: every vertex repeatedly adopts
the smallest label among itself and its neighbors until fixpoint.

Scale notes: each iteration is one join + one aggregate (two shuffles);
iteration count is bounded by the graph diameter (near-dup clusters are
shallow — a handful of iterations). `localCheckpoint` truncates the
lineage so plans don't grow exponentially. For web-scale graphs use
GraphFrames/GraphX large-star/small-star; this formulation needs
nothing beyond the DataFrame API.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) where component = min vertex id reachable.

    `vertices`: one column `vertex_col`; `edges`: (src_col, dst_col).
    Isolated vertices keep their own id as component.

    Warns (RuntimeWarning) if `max_iter` is reached while labels are
    still changing — i.e. a component's diameter exceeds `max_iter` and
    the returned labels are not a fixpoint. Raise `max_iter` or switch
    to a large-star/small-star formulation for deep graphs.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    labels = vertices.select(
        F.col(vertex_col).alias("vertex"), F.col(vertex_col).alias("component")
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.vertex)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); results are not a fixpoint",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    web-scale alternative to min-label propagation: converges in
    O(log² n) rounds on ANY graph shape (label propagation needs
    O(diameter) rounds, fatal on chain-shaped corpora), and each round
    is plain DataFrame groupBy/join — no GraphX/GraphFrames needed.

    large-star: every node points its LARGER neighbors at its minimum
    neighbor; small-star: every node points its smaller-or-equal
    neighbors at the minimum. Alternating the two contracts every tree
    to a star whose root is the component minimum; fixpoint reached
    when the edge set stops changing.

    Returns (vertex, component) with isolated vertices mapping to
    themselves, exactly like `connected_components`.
    """

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def _min_nbr(sym: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u})
        return sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        m = _min_nbr(sym)
        # (v, m(u)) for v ∈ Γ(u), v > u
        return (
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient edges toward the smaller endpoint first
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        m = oriented.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        # (v, m(u)) for v ∈ Γ⁻(u) ∪ {u}
        j = oriented.join(m, "src")
        return (
            j.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(j.select("src", F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # multiset equality via ONE exceptAll + a count (r11): e2⊆e as
        # multisets plus |e2| == |e| implies e2 == e — the second
        # (reverse) exceptAll join per round was redundant. Both inputs
        # are distinct-deduped star edges; counts scan the
        # materialized checkpoints only.
        n2 = e2.count()
        unchanged = n2 == n_edges and e2.exceptAll(e).limit(1).count() == 0
        e, n_edges = e2, n2
        if unchanged:
            break
    else:
        warnings.warn(
            f"connected_components_star did not converge within max_iter={max_iter}",
            RuntimeWarning,
            stacklevel=2,
        )
    # fixpoint edges form stars (v → component root); add the roots and
    # the isolated vertices. The min() keeps the one-label-per-vertex
    # contract even if the loop exited unconverged (non-star edges).
    membership = (
        e.select(F.col("src").alias("vertex"), F.col("dst").alias("component"))
        .groupBy("vertex")
        .agg(F.min("component").alias("component"))
    )
    verts = vertices.select(F.col(vertex_col).alias("vertex"))
    return (
        verts.join(membership, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("component"), F.col("vertex")).alias("component"),
        )
    )
