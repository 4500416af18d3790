"""Graph analytics (round 5): PageRank over the customer–supplier
bipartite graph (who-buys-from-whom, undirected), the third iterative
algorithm in the repo after connected components and k-means.

Engine-exact like embedding_kmeans: per-edge contributions are
converted to int64 nano-units and SUMMED EXACTLY (a double sum would
depend on accumulation order and flip the hash), and every new rank
is re-rounded with the portable pround before it feeds the next
iteration — so Spark's and DuckDB's rank doubles are bit-identical at
every step and the oracle can simply unroll the iterations as CTEs.

Scale shape: ranks/degrees are O(|V|) and BROADCAST into the per-edge
contribution join, so the O(|E|) side never shuffles for the join; the
only full shuffle per iteration is the map-side-combined groupBy(dst).
That is the standard Pregel-style topology — at 100 TB of edges you'd
pre-partition edges by dst and the contribution aggregation becomes
co-located too. No driver-side collect anywhere (unlike k-means, the
whole iteration chain is one lazy plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..registry import query

PR_ITERS = 3
PR_DAMP = 0.85

# int64 nano-unit fixed-point of a non-negative double expression
_NANO = "CAST(floor(({x}) * 1000000000.0 + 0.5) AS BIGINT)"


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    contrib = _NANO.format(x="r.rank / CAST(r.degree AS DOUBLE)")

    def new_rank(it: int) -> str:
        return R(
            f"({1.0 - PR_DAMP} / CAST(n.n_nodes AS DOUBLE)"
            f" + {PR_DAMP} * (CAST(coalesce(i{it}.s, 0) AS DOUBLE)"
            " / 1000000000.0))",
            9,
        )

    parts = [
        """pairs AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)""",
        """edges AS (
  SELECT concat('c:', CAST(ck AS VARCHAR)) AS src,
         concat('s:', CAST(sk AS VARCHAR)) AS dst FROM pairs
  UNION ALL
  SELECT concat('s:', CAST(sk AS VARCHAR)) AS src,
         concat('c:', CAST(ck AS VARCHAR)) AS dst FROM pairs
)""",
        """deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
  FROM edges GROUP BY src
)""",
        """n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg
)""",
        f"""r0 AS (
  SELECT d.node, d.degree,
         {R("(1.0 / CAST(n.n_nodes AS DOUBLE))", 9)} AS rank
  FROM deg d CROSS JOIN n
)""",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""i{it} AS (
  SELECT e.dst AS node, CAST(sum({contrib}) AS BIGINT) AS s
  FROM edges e JOIN r{it - 1} r ON e.src = r.node
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{it} AS (
  SELECT d.node, d.degree, {new_rank(it)} AS rank
  FROM deg d CROSS JOIN n LEFT JOIN i{it} ON d.node = i{it}.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, degree, {R("rank", 9)} AS rank
FROM r{iters} ORDER BY node"""
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the undirected
    customer–supplier purchase graph; one row per node with its degree
    and final rank."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("cnode"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("snode"),
        )
        .distinct()
    )
    # repartition on src so the degree aggregate and every iteration's
    # contribution join consume ONE materialized shuffle of the edge
    # list instead of re-deriving it (orders⋈lineitem + distinct) per
    # consumer — 4 recomputes at 3 iterations, ~3× slower at sf0.1
    edges = (
        pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
        .union(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))
        .repartition("src")
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    n = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node",
        "degree",
        "n_nodes",
        pround(F.lit(1.0) / F.col("n_nodes").cast("double"), 9).alias("rank"),
    )
    for _ in range(PR_ITERS):
        contrib_nano = F.floor(
            (F.col("rank") / F.col("degree").cast("double")) * F.lit(1e9) + F.lit(0.5)
        ).cast("long")
        inc = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node"])
            .select(F.col("dst"), contrib_nano.alias("nano"))
            .groupBy("dst")
            .agg(F.sum("nano").cast("long").alias("s"))
        )
        ranks = (
            deg.crossJoin(F.broadcast(n))
            .join(F.broadcast(inc), deg["node"] == inc["dst"], "left")
            .select(
                "node",
                "degree",
                "n_nodes",
                pround(
                    F.lit(1.0 - PR_DAMP) / F.col("n_nodes").cast("double")
                    + F.lit(PR_DAMP)
                    * (F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(1e9)),
                    9,
                ).alias("rank"),
            )
        )
    return ranks.select("node", "degree", pround("rank", 9).alias("rank")).orderBy(
        "node"
    )
