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
