"""Similarity search over the `embeddings` table.

- knn_bruteforce_cosine: exact top-k — the correctness baseline, fully
  oracle-checked (rank computed over ROUNDED cosine with id tie-break,
  so cross-engine ordering is deterministic).
- ann_lsh_cosine: random-hyperplane LSH bucketing — the 100 TB path
  (candidates only within buckets; one shuffle on bucket key instead
  of an O(n²) cross join). Hyperplanes are derived deterministically
  from md5, so results are reproducible; rows-only driver check, with
  structural assertions in tests/test_similarity.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, scatter
from ..functions.portable import pround, sql_round as R
from ..functions.vectors import cosine, sql_cosine
from ..registry import query

N_QUERIES = 5
TOP_K = 10
N_PLANES = 4
DIM = 64


@query(
    "knn_bruteforce_cosine",
    oracle=f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {R(sql_cosine("q.embedding", "c.embedding"), 6)} AS cosine
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scatter so the per-pair fixed-point dot products run wide
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_c"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine("emb_q", "emb_c"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across sessions and engines (no RNG state)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{j}:{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(1 << 32) - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(emb_col: str) -> F.Column:
    """Sign-bit bucket key from the deterministic hyperplanes."""
    bits = []
    for row in _hyperplanes():
        plane = F.array(*[F.lit(v) for v in row])
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _centroids(n_cells: int = 8, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random coarse centroids (md5-derived).
    Production IVF would k-means these; deterministic seeds keep the
    demo reproducible with the same Spark-side plumbing."""
    cells = []
    for c in range(n_cells):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"centroid:{c}:{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(1 << 32) - 0.5)
        cells.append(row)
    return cells


def _cell_scores(emb_col: str):
    """Dot product against every centroid (codegen'd, no Python)."""
    scores = []
    for row in _centroids():
        cen = F.array(*[F.lit(v) for v in row])
        scores.append(
            F.aggregate(
                F.zip_with(F.col(emb_col), cen, lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return scores


def assign_cells(df, emb_col: str, nprobe: int = 1):
    """Add `cells`: indices (0-based) of the nprobe highest-dot
    centroids — argmax via array_position (first match = deterministic
    tie-break)."""
    df = df.withColumn("_s", F.array(*_cell_scores(emb_col)))
    best1 = (F.array_position(F.col("_s"), F.array_max("_s")) - 1).cast("int")
    df = df.withColumn("_c1", best1)
    if nprobe == 1:
        return df.withColumn("cells", F.array(F.col("_c1"))).drop("_s", "_c1")
    masked = F.transform(
        F.col("_s"),
        lambda x, i: F.when(i == F.col("_c1"), F.lit(-1e300)).otherwise(x),
    )
    best2 = (F.array_position(masked, F.array_max(masked)) - 1).cast("int")
    return df.withColumn("cells", F.array(F.col("_c1"), best2)).drop("_s", "_c1")


@query("ann_ivf_cosine")  # rows-only: IVF cells aren't SQL-oracle-expressible cheaply
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's nprobe=2
    coarse cells; vectors carry a single best cell. At scale the
    inverted lists are the partitioning: shuffle once on cell id,
    search within cells only."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    cand = assign_cells(emb, "embedding", nprobe=1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        F.element_at("cells", 1).alias("cell"),
    )
    q = assign_cells(
        emb.filter(F.col("vec_id") < N_QUERIES), "embedding", nprobe=2
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.explode("cells").alias("cell"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine("emb_q", "emb_c"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine", "cell")
        .orderBy("query_id", "rank")
    )


@query("ann_lsh_cosine")  # rows-only: LSH bucketing isn't SQL-oracle-expressible cheaply
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", lsh_bucket("embedding")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.col("bucket").alias("bq"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        F.col("bucket").alias("bc"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(
            F.broadcast(q),
            (F.col("bq") == F.col("bc")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cosine", pround(cosine("emb_q", "emb_c"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine", F.col("bq").alias("bucket"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN (round 2): vectors compressed to M
# sub-space centroid codes; search scores queries against the RECONSTRUCTED
# (decoded) vectors. 64 dims → 4 codes is a 64× memory compression — the
# way billion-vector indexes fit in RAM at 100 TB corpus scale (IVF-PQ).
# Deterministic md5-derived codebooks (production would k-means them);
# rows-only driver check + structural/exactness tests in pytest.
# ---------------------------------------------------------------------------
PQ_M = 4        # sub-spaces
PQ_SUBDIM = 16  # dims per sub-space (M × SUBDIM = DIM)
PQ_K = 8        # centroids per sub-space


def _pq_codebook(m: int) -> list[list[float]]:
    """K deterministic centroids for sub-space m."""
    book = []
    for k in range(PQ_K):
        row = []
        for i in range(PQ_SUBDIM):
            h = hashlib.md5(f"pq:{m}:{k}:{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(1 << 32) - 0.5)
        book.append(row)
    return book


def _subvec(emb_col: str, m: int) -> F.Column:
    return F.slice(F.col(emb_col), m * PQ_SUBDIM + 1, PQ_SUBDIM)


def pq_encode(df, emb_col: str = "embedding"):
    """Add code_0..code_{M-1}: nearest-centroid index per sub-space
    (squared-distance argmin, first-match deterministic tie-break).
    All JVM-side array math inside codegen."""
    for m in range(PQ_M):
        sub = _subvec(emb_col, m)
        dists = []
        for row in _pq_codebook(m):
            cen = F.array(*[F.lit(v) for v in row])
            diff = F.zip_with(sub, cen, lambda x, c: x.cast("double") - c)
            dists.append(
                F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)
            )
        darr = F.array(*dists)
        df = df.withColumn(
            f"code_{m}", (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        )
    return df


def pq_decode(df):
    """Add `reconstructed`: concatenation of each sub-space's centroid
    (array-literal lookup by code) — the ADC approximation target."""
    parts = []
    for m in range(PQ_M):
        book = F.array(
            *[F.array(*[F.lit(v) for v in row]) for row in _pq_codebook(m)]
        )
        parts.append(F.element_at(book, F.col(f"code_{m}") + 1))
    return df.withColumn("reconstructed", F.concat(*parts))


@query("ann_pq_cosine")  # rows-only: PQ codebooks aren't SQL-oracle-expressible cheaply
def ann_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN: rank candidates by cosine(query, decode(encode(vector))).
    Queries stay full-precision (asymmetric distance computation); the
    database side carries only M small int codes + the shared codebook."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    cand = pq_decode(pq_encode(emb)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("reconstructed").alias("emb_c"),
        *[F.col(f"code_{m}") for m in range(PQ_M)],
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("approx_cosine", pround(cosine("emb_q", "emb_c"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "approx_cosine")
        .orderBy("query_id", "rank")
    )
