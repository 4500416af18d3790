"""Similarity search over the `embeddings` table.

- knn_bruteforce_cosine: exact top-k — the correctness baseline, fully
  oracle-checked (rank computed over ROUNDED cosine with id tie-break,
  so cross-engine ordering is deterministic).
- ann_lsh_cosine: random-hyperplane LSH bucketing — the 100 TB path
  (candidates only within buckets; one shuffle on bucket key instead
  of an O(n²) cross join). Hyperplanes are derived deterministically
  from md5 and all scoring is FIXED-POINT int64 (functions/vectors.py),
  so bucket signs / cell argmax / code argmin are bit-identical across
  engines — the whole ANN family is fully DuckDB-oracle-checked, with
  the md5 constants inlined into the oracle SQL as list literals
  (the same portability technique as queries/approx.py's CMS/KMV).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, scatter
from ..functions.portable import pround, sql_round as R
from ..functions.vectors import (
    dot_fixed,
    sql_cosine,
    sql_dot_fixed,
    sql_list_lit,
    sql_sqdist_fixed,
    sqdist_fixed,
    with_pair_cosine,
)
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
    # scatter so the per-pair fixed-point dot products run wide; self-
    # dots hoisted per vector, cross-dot materialized once per pair
    # (with_pair_cosine — bit-identical, 9→1 folds per pair, r11)
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings")).withColumn(
        "self_dot", dot_fixed("embedding", "embedding") / F.lit(1e9)
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.col("self_dot").alias("daa"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        F.col("self_dot").alias("dbb"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "cosine", daa="daa", dbb="dbb")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(
    n_planes: int = N_PLANES, dim: int = DIM, prefix: str = "plane"
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across sessions and engines (no RNG state). `prefix` seeds an
    independent table (OR-amplified multi-table LSH)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{prefix}:{j}:{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(1 << 32) - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(
    emb_col: str, prefix: str = "plane", n_planes: int = N_PLANES
) -> F.Column:
    """Sign-bit bucket key from the deterministic hyperplanes.
    Fixed-point dots, so the sign test is engine-exact. `n_planes` is
    the AND-amplification knob (each extra plane halves the expected
    bucket occupancy; see dedup_embedding_lsh for the measured
    precision/recall frontier)."""
    bits = []
    for row in _hyperplanes(n_planes=n_planes, prefix=prefix):
        plane = F.array(*[F.lit(v) for v in row])
        dot = dot_fixed(F.col(emb_col), plane)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def sql_lsh_bucket(emb: str, prefix: str = "plane") -> str:
    """DuckDB twin of lsh_bucket (hyperplanes inlined as literals)."""
    bits = [
        f"CASE WHEN {sql_dot_fixed(emb, sql_list_lit(row))} >= 0 "
        "THEN '1' ELSE '0' END"
        for row in _hyperplanes(prefix=prefix)
    ]
    return "concat(" + ", ".join(bits) + ")"


# Gate-SF default cell count. The production rule is n_cells ≈ √n
# (balances the two cost terms: per-query centroid scoring ∝ n_cells
# and per-cell candidate scan ∝ n/n_cells) — measured at sf1 in
# SCALING.md via ann_ivf_cosine_at(n_cells≈√n). The registered query
# keeps the fixed default so the oracle literals stay stable.
N_CELLS = 8


def _centroids(n_cells: int = N_CELLS, dim: int = DIM) -> list[list[float]]:
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


def _cell_scores(emb_col: str, n_cells: int = N_CELLS):
    """Fixed-point dot against every centroid (codegen'd, no Python) —
    argmax over int64 scores is engine-exact."""
    scores = []
    for row in _centroids(n_cells):
        cen = F.array(*[F.lit(v) for v in row])
        scores.append(dot_fixed(F.col(emb_col), cen))
    return scores


def assign_cells(df, emb_col: str, nprobe: int = 1, n_cells: int = N_CELLS):
    """Add `cells`: indices (0-based) of the nprobe highest-dot
    centroids — argmax via array_position (first match = deterministic
    tie-break)."""
    df = df.withColumn("_s", F.array(*_cell_scores(emb_col, n_cells)))
    best1 = (F.array_position(F.col("_s"), F.array_max("_s")) - 1).cast("int")
    df = df.withColumn("_c1", best1)
    if nprobe == 1:
        return df.withColumn("cells", F.array(F.col("_c1"))).drop("_s", "_c1")
    masked = F.transform(
        F.col("_s"),
        lambda x, i: F.when(i == F.col("_c1"), F.lit(-(1 << 62))).otherwise(x),
    )
    best2 = (F.array_position(masked, F.array_max(masked)) - 1).cast("int")
    return df.withColumn("cells", F.array(F.col("_c1"), best2)).drop("_s", "_c1")


def _sql_cents() -> str:
    """`cents(cell, cvec)` VALUES CTE body with the md5 centroids."""
    rows = ", ".join(
        f"({c}, {sql_list_lit(row)})" for c, row in enumerate(_centroids())
    )
    return f"cents(cell, cvec) AS (VALUES {rows})"


# rc ranks every (vector, centroid) pair by fixed-point dot DESC with
# cell-ascending tie-break — identical to assign_cells' array_position
# first-match argmax (rnk=1 = best cell, rnk<=2 = nprobe 2).
_SQL_IVF_RC = f"""
rc AS (
  SELECT e.vec_id, e.embedding, ct.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {sql_dot_fixed('e.embedding', 'ct.cvec')} DESC, ct.cell
         ) AS rnk
  FROM embeddings e CROSS JOIN cents ct
)"""


@query(
    "ann_ivf_cosine",
    oracle=f"""
WITH {_sql_cents()},
{_SQL_IVF_RC},
cand AS (SELECT vec_id AS neighbor_id, embedding AS emb_c, cell FROM rc WHERE rnk = 1),
qs AS (SELECT vec_id AS query_id, embedding AS emb_q, cell
       FROM rc WHERE vec_id < {N_QUERIES} AND rnk <= 2),
pairs AS (
  SELECT qs.query_id, cand.neighbor_id, cand.cell,
         {R(sql_cosine('qs.emb_q', 'cand.emb_c'), 6)} AS cosine
  FROM cand JOIN qs ON cand.cell = qs.cell AND cand.neighbor_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cell, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, cosine, cell
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's nprobe=2
    coarse cells; vectors carry a single best cell. At scale the
    inverted lists are the partitioning: shuffle once on cell id,
    search within cells only. Cell count is N_CELLS here (stable oracle
    literals); production sizes it by the √n rule — see
    ann_ivf_cosine_at and the SCALING.md sf1 measurement."""
    return ann_ivf_cosine_at(spark, sf_dir)


def _ivf_cell_ranked(spark: SparkSession, emb: DataFrame, n_cells: int = N_CELLS):
    """(vec_id, embedding, cell, rnk): every vector ranked against the
    broadcast centroid relation by fixed-point dot DESC with cell-ASC
    tie-break — the DataFrame twin of the oracle's `rc` CTE and of
    assign_cells' array_position first-match argmax (rnk=1 = best
    cell, rnk≤2 = nprobe 2). Scoring is a broadcast nested-loop over
    the k-row codebook; only the per-vector rank shuffles (on vec_id)."""
    cents = spark.createDataFrame(
        [(c, [float(v) for v in row]) for c, row in enumerate(_centroids(n_cells))],
        schema="cell INT, cvec ARRAY<DOUBLE>",
    )
    wa = W.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cell"))
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("score", dot_fixed("embedding", "cvec"))
        .withColumn("rnk", F.row_number().over(wa))
    )


def ann_ivf_cosine_at(
    spark: SparkSession, sf_dir: str, n_cells: int = N_CELLS
) -> DataFrame:
    """ann_ivf_cosine with the coarse-quantizer cell count exposed —
    the knob the √n rule tunes (n_cells ≈ √n balances per-query
    centroid scoring ∝ n_cells against per-cell candidate scan ∝
    n/n_cells). Same deterministic md5 centroid family and the same
    ranking semantics (fixed-point dot DESC, cell-ASC tie-break) as
    the registered query — pinned equal at n_cells=N_CELLS by
    tests/test_similarity.py.

    ARCHITECTURE (r11): the codebook here is a broadcast RELATION, not
    inline literal expressions. assign_cells' inlined arrays are right
    for a handful of cells, but each centroid becomes expression-tree
    code — at k = 141 (√n for sf1) codegen OOMs the driver before a
    single row moves. Joining a k-row broadcast frame scales k as
    DATA: scoring is a shuffle-free broadcast nested-loop (n·k rows,
    one fixed-point fold each), the per-vector argmax is a window on
    vec_id (at extreme scale a map-side max_by aggregate removes that
    shuffle too)."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    ranked = _ivf_cell_ranked(spark, emb, n_cells)
    cand = ranked.filter(F.col("rnk") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        "cell",
    )
    q = ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rnk") <= 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        "cell",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    joined = cand.join(F.broadcast(q), ["cell"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine", "cell")
        .orderBy("query_id", "rank")
    )


@query(
    "ann_lsh_cosine",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
         {R(sql_cosine('q.embedding', 'c.embedding'), 6)} AS cosine
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, bucket, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, cosine, bucket
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
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
    joined = c.join(
        F.broadcast(q),
        (F.col("bq") == F.col("bc")) & (F.col("neighbor_id") != F.col("query_id")),
    )
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "cosine")
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
    (fixed-point squared-distance argmin, first-match deterministic
    tie-break — engine-exact). All JVM-side array math.

    r11: the per-sub-space distance array is materialized as its own
    column before the argmin references it — the inline form embedded
    the K fold expressions twice (array_position + array_min), i.e.
    2·M·K = 64 interpreted 16-dim folds per row instead of 32."""
    for m in range(PQ_M):
        sub = _subvec(emb_col, m)
        dists = [
            sqdist_fixed(sub, F.array(*[F.lit(v) for v in row]))
            for row in _pq_codebook(m)
        ]
        df = df.withColumn(f"_d{m}", F.array(*dists)).withColumn(
            f"code_{m}",
            (F.array_position(F.col(f"_d{m}"), F.array_min(f"_d{m}")) - 1).cast("int"),
        ).drop(f"_d{m}")
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


def _pq_reconstructed(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(vec_id, reconstructed): PQ encode+decode via the codebook as a
    broadcast RELATION (r11) — the DataFrame twin of the oracle's
    enc/recon CTEs. Each vector scores the M·K book rows (one
    fixed-point sub-space sqdist per row, broadcast nested-loop), the
    per-(vector, sub-space) argmin is a row_number with code-ASC
    tie-break (identical to pq_encode's array_position first-match),
    and the decoded vector is the chosen centroids concatenated in
    sub-space order. Replaces 64 inline 16-dim fold TREES per row
    (pq_encode's argmin embedded each codebook fold twice) with n·M·K
    data rows — codebook size scales as data, not as expression code."""
    books = spark.createDataFrame(
        [
            (m, k, [float(v) for v in row])
            for m in range(PQ_M)
            for k, row in enumerate(_pq_codebook(m))
        ],
        schema="m INT, code INT, bvec ARRAY<DOUBLE>",
    )
    sub = F.slice(F.col("embedding"), F.col("m") * PQ_SUBDIM + 1, PQ_SUBDIM)
    we = W.partitionBy("vec_id", "m").orderBy(F.asc("dist"), F.asc("code"))
    enc = (
        emb.crossJoin(F.broadcast(books))
        .withColumn("dist", sqdist_fixed(sub, F.col("bvec")))
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") == 1)
    )
    return enc.groupBy("vec_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "bvec"))),
                lambda s: s["bvec"],
            )
        ).alias("reconstructed")
    )


def _sql_books() -> str:
    """`books(m, code, bvec)` VALUES CTE with all M×K PQ centroids."""
    rows = ", ".join(
        f"({m}, {k}, {sql_list_lit(row)})"
        for m in range(PQ_M)
        for k, row in enumerate(_pq_codebook(m))
    )
    return f"books(m, code, bvec) AS (VALUES {rows})"


# enc ranks every (vector, sub-space, centroid) triple by fixed-point
# squared distance ASC with code-ascending tie-break — identical to
# pq_encode's array_position first-match argmin; rnk=1 is the code.
# recon rebuilds the decoded vector by concatenating the chosen
# centroids in sub-space order (pq_decode's F.concat twin).
_SQL_PQ_RECON = f"""
enc AS (
  SELECT e.vec_id, bk.m, bk.code, bk.bvec,
         row_number() OVER (
           PARTITION BY e.vec_id, bk.m
           ORDER BY {sql_sqdist_fixed('e.embedding', 'bk.bvec', 'bk.m * ' + str(PQ_SUBDIM), PQ_SUBDIM)} ASC, bk.code
         ) AS rnk
  FROM embeddings e CROSS JOIN books bk
),
recon AS (
  SELECT vec_id, flatten(list(bvec ORDER BY m)) AS reconstructed
  FROM enc WHERE rnk = 1 GROUP BY vec_id
)"""


@query(
    "ann_pq_cosine",
    oracle=f"""
WITH {_sql_books()},
{_SQL_PQ_RECON},
qs AS (SELECT vec_id AS query_id, embedding AS emb_q
       FROM embeddings WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT qs.query_id, r.vec_id AS neighbor_id,
         {R(sql_cosine('qs.emb_q', 'r.reconstructed'), 6)} AS approx_cosine
  FROM recon r CROSS JOIN qs
  WHERE r.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, approx_cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, approx_cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def ann_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN: rank candidates by cosine(query, decode(encode(vector))).
    Queries stay full-precision (asymmetric distance computation); the
    database side carries only M small int codes + the shared codebook.

    r11 perf (bit-identical, same hoist as dedup_embedding_lsh r10):
    both SELF-dot products depend only on the individual vectors, so
    they are computed once per vector (n + N_QUERIES folds) instead of
    per pair (2·n·N_QUERIES interpreted 64-dim HOF folds); only the
    cross-dot stays in the pair join. The fixed-point self-dot is
    deterministic, so the joined value equals what the per-pair fold
    produced. Encode/decode run over the codebook RELATION
    (_pq_reconstructed) instead of inline literal expression trees."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    cand = _pq_reconstructed(spark, emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("reconstructed").alias("emb_c"),
        (dot_fixed("reconstructed", "reconstructed") / F.lit(1e9)).alias("dbb"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        (dot_fixed("embedding", "embedding") / F.lit(1e9)).alias("daa"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    joined = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    return (
        with_pair_cosine(
            joined, "emb_q", "emb_c", "approx_cosine", daa="daa", dbb="dbb"
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "approx_cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ (round 3): the production billion-vector layout — coarse IVF
# cells bound the candidate set (shuffle once on cell id), PQ codes
# bound per-vector memory (M small ints instead of DIM floats). Search:
# probe the query's nprobe cells, score full-precision query against
# DECODED candidates (asymmetric distance), top-k per query.
# ---------------------------------------------------------------------------
@query(
    "ann_ivfpq_cosine",
    oracle=f"""
WITH {_sql_cents()},
{_SQL_IVF_RC},
{_sql_books()},
{_SQL_PQ_RECON.lstrip()},
cand AS (
  SELECT rc.vec_id AS neighbor_id, r.reconstructed AS emb_c, rc.cell
  FROM rc JOIN recon r ON r.vec_id = rc.vec_id
  WHERE rc.rnk = 1
),
qs AS (SELECT vec_id AS query_id, embedding AS emb_q, cell
       FROM rc WHERE vec_id < {N_QUERIES} AND rnk <= 2),
pairs AS (
  SELECT qs.query_id, cand.neighbor_id, cand.cell,
         {R(sql_cosine('qs.emb_q', 'cand.emb_c'), 6)} AS approx_cosine
  FROM cand JOIN qs ON cand.cell = qs.cell AND cand.neighbor_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cell, approx_cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, approx_cosine, cell
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def ann_ivfpq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: candidates carry (cell, PQ codes) only; queries stay
    full precision and probe nprobe=2 cells. At 100 TB the inverted
    lists are the partitioning and the PQ codes are the only per-vector
    state — 64 floats → 4 int codes is what lets a billion-vector index
    fit executor memory.

    r11 perf: SELF-dots hoisted per vector out of the pair join
    (bit-identical — see ann_pq_cosine's note); cell assignment and
    PQ encode/decode run over broadcast codebook RELATIONS
    (_ivf_cell_ranked / _pq_reconstructed) instead of inline literal
    expression trees."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    ranked = _ivf_cell_ranked(spark, emb)
    cells1 = ranked.filter(F.col("rnk") == 1).select("vec_id", "embedding", "cell")
    cand = _pq_reconstructed(spark, emb).join(
        cells1.select("vec_id", "cell"), ["vec_id"]
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("reconstructed").alias("emb_c"),
        (dot_fixed("reconstructed", "reconstructed") / F.lit(1e9)).alias("dbb"),
        "cell",
    )
    q = ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rnk") <= 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        (dot_fixed("embedding", "embedding") / F.lit(1e9)).alias("daa"),
        "cell",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    joined = cand.join(F.broadcast(q), ["cell"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return (
        with_pair_cosine(
            joined, "emb_q", "emb_c", "approx_cosine", daa="daa", dbb="dbb"
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "approx_cosine", "cell")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (round 3): the quality counterpart to PQ above.
# PQ's md5 codebooks are untrained (production k-means is data-dependent
# and so not portably reproducible), which caps its recall on isotropic
# embeddings. Scalar quantization needs NO training to be near-optimal:
# each dimension of a unit-normalized isotropic vector is ~N(0, 1/dim),
# so the Lloyd-Max 16-level quantizer for that Gaussian — computed here
# analytically, no data involved — is the codebook k-means would find.
# 4 bits/dim = 8x compression vs float32, and reconstruction is close
# enough that top-k ranking survives (recall contract in
# tests/test_similarity.py). Encode/decode are single array exprs
# (transform + boundary counting), so the plan stays tiny and
# whole-stage-codegen'd; the oracle inlines the same level/boundary
# literals.
# ---------------------------------------------------------------------------
SQ_LEVELS = 16
SQ_SIGMA = 1.0 / 8.0  # component stddev of a unit 64-dim isotropic vector


def _sq_levels() -> list[float]:
    """Lloyd-Max 16-level quantizer points for N(0, SQ_SIGMA^2), from
    deterministic fixed-point iteration on the analytic Gaussian
    (centroid = conditional mean between decision boundaries)."""
    import math

    def phi(x: float) -> float:
        return math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi)

    def Phi(x: float) -> float:
        return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

    # init: equiprobable-mass representative points
    lv = [
        -4.0 + 8.0 * (i + 0.5) / SQ_LEVELS  # spread over +-4 sigma
        for i in range(SQ_LEVELS)
    ]
    for _ in range(200):
        bnd = [(lv[i] + lv[i + 1]) / 2.0 for i in range(SQ_LEVELS - 1)]
        lo = [-math.inf] + bnd
        hi = bnd + [math.inf]
        new = []
        for a, b in zip(lo, hi):
            mass = Phi(b) - Phi(a)
            pa = phi(a) if a != -math.inf else 0.0
            pb = phi(b) if b != math.inf else 0.0
            new.append((pa - pb) / mass if mass > 0 else (a + b) / 2.0)
        if new == lv:
            break
        lv = new
    return [v * SQ_SIGMA for v in lv]


def _sq_boundaries() -> list[float]:
    lv = _sq_levels()
    return [(lv[i] + lv[i + 1]) / 2.0 for i in range(SQ_LEVELS - 1)]


def sq_encode(emb_col: str) -> F.Column:
    """`codes` array<int>: per-dim nearest Lloyd-Max level, decided by
    boundary counting (code = #boundaries below x) — a pure comparison
    against shared double literals, so engine-exact by construction."""
    bnd = F.array(*[F.lit(b) for b in _sq_boundaries()])
    return F.transform(
        F.col(emb_col),
        lambda x: F.aggregate(
            bnd,
            F.lit(0),
            lambda acc, b: acc + F.when(x.cast("double") > b, 1).otherwise(0),
        ),
    )


def sq_decode(codes) -> F.Column:
    """`reconstructed` array<double>: level lookup per code (accepts a
    column name or the Column from sq_encode)."""
    lv = F.array(*[F.lit(v) for v in _sq_levels()])
    col = F.col(codes) if isinstance(codes, str) else codes
    return F.transform(col, lambda c: F.element_at(lv, c + 1))


def sql_sq_reconstructed(emb: str) -> str:
    """DuckDB twin of sq_decode(sq_encode(emb)) in one expression."""
    bnd = sql_list_lit(_sq_boundaries())
    lv = sql_list_lit(_sq_levels())
    code = (
        f"CAST(list_sum(list_transform({bnd}, "
        f"b -> CASE WHEN CAST(x AS DOUBLE) > b THEN 1 ELSE 0 END)) AS INT)"
    )
    return f"list_transform({emb}, x -> ({lv})[{code} + 1])"


@query(
    "ann_sq_cosine",
    oracle=f"""
WITH recon AS (
  SELECT vec_id, {sql_sq_reconstructed('embedding')} AS emb_c
  FROM embeddings
),
qs AS (SELECT vec_id AS query_id, embedding AS emb_q
       FROM embeddings WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT qs.query_id, r.vec_id AS neighbor_id,
         {R(sql_cosine('qs.emb_q', 'r.emb_c'), 6)} AS approx_cosine
  FROM recon r CROSS JOIN qs
  WHERE r.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, approx_cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, approx_cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def ann_sq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN: candidates carry 4-bit codes per dim; the
    full-precision query scores against decoded candidates (asymmetric,
    like PQ). The high-recall compressed path when codebook training
    isn't available — see the module comment for why this beats
    untrained PQ."""
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        sq_decode(sq_encode("embedding")).alias("emb_c"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    joined = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "approx_cosine")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "approx_cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Cosine range search (round 5): ALL neighbors within a similarity
# radius (cosine >= tau) for each query vector — the retrieval shape
# dedup and near-dup mining use when k is unknown (a fixed top-k
# either truncates dense neighborhoods or pads sparse ones). Brute
# force against a BROADCAST query set: at 100 TB the corpus side
# stays partition-parallel and shuffle-free; the bucketed variant for
# huge query sets is the same composition as dedup_embedding_lsh.
# ---------------------------------------------------------------------------
RANGE_TAU = 0.4


@query(
    "ann_range_search",
    oracle=f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {R(sql_cosine("q.embedding", "c.embedding"), 6)} AS cosine
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cosine FROM pairs
WHERE cosine >= {RANGE_TAU}
ORDER BY query_id, neighbor_id
""",
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_c")
    )
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "cosine", min_value=RANGE_TAU)
        .select("query_id", "neighbor_id", "cosine")
        .orderBy("query_id", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining — the contrastive-training data op: for each
# query vector, the top-3 MOST similar vectors with a DIFFERENT label
# (near-misses make the best negatives; random negatives are too easy).
# Same broadcast-query + fixed-point-cosine shape as the brute-force
# kNN baseline, with the label inequality fused into the join; the
# LSH/IVF families are the drop-in scale path for the candidate set.
# ---------------------------------------------------------------------------

N_HN_QUERIES = 8
HN_TOP_K = 3


@query(
    "hard_negative_mining",
    oracle=f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {R(sql_cosine("q.embedding", "c.embedding"), 6)} AS cosine
  FROM embeddings q JOIN embeddings c
    ON c.vec_id <> q.vec_id AND c.label <> q.label
  WHERE q.vec_id < {{NQ}}
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, negative_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, query_label, negative_id, negative_label, rank, cosine
FROM ranked WHERE rank <= {{K}}
ORDER BY query_id, rank
""".replace("{NQ}", str(N_HN_QUERIES)).replace("{K}", str(HN_TOP_K)),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("emb_q"),
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("emb_c"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("negative_id"))
    joined = c.join(
        F.broadcast(q),
        (F.col("negative_id") != F.col("query_id"))
        & (F.col("negative_label") != F.col("query_label")),
    )
    return (
        with_pair_cosine(joined, "emb_q", "emb_c", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HN_TOP_K)
        .select("query_id", "query_label", "negative_id", "negative_label", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall audit (Kusupati et al. 2022): how much
# of the full-dimension top-10 neighborhood survives when cosine runs
# on only the FIRST 16 of 64 dimensions — the measurement behind
# serving embeddings at reduced dimension (cheaper ANN memory /
# bandwidth) with a full-dim re-rank. Both rankings use the house
# fixed-point cosine (bit-identical both engines; ties break on
# neighbor_id), so the per-query overlap count is engine-exact.
# Scale: same broadcast-queries shape as knn_bruteforce_cosine — the
# corpus side streams, queries are bounded.
# ---------------------------------------------------------------------------
_MRL_DIM = 16


@query(
    "embedding_matryoshka_recall",
    oracle=f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {R(sql_cosine("q.embedding", "c.embedding"), 6)} AS cos_full,
         {R(sql_cosine(f"q.embedding[1:{_MRL_DIM}]", f"c.embedding[1:{_MRL_DIM}]"), 6)} AS cos_trunc
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), rf AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS r
  FROM pairs
), rt AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_trunc DESC, neighbor_id) AS r
  FROM pairs
)
SELECT rf.query_id,
       CAST(count(rt.neighbor_id) AS BIGINT) AS n_overlap,
       {R(f"CAST(count(rt.neighbor_id) AS DOUBLE) / {TOP_K}.0", 2)} AS recall_at_10
FROM rf
LEFT JOIN rt ON rt.query_id = rf.query_id
            AND rt.neighbor_id = rf.neighbor_id AND rt.r <= {TOP_K}
WHERE rf.r <= {TOP_K}
GROUP BY rf.query_id
ORDER BY rf.query_id
""",
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_c")
    )
    joined = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("emb_q16", F.slice(F.col("emb_q"), 1, _MRL_DIM))
        .withColumn("emb_c16", F.slice(F.col("emb_c"), 1, _MRL_DIM))
    )
    joined = with_pair_cosine(joined, "emb_q", "emb_c", "cos_full")
    pairs = with_pair_cosine(joined, "emb_q16", "emb_c16", "cos_trunc").select(
        "query_id", "neighbor_id", "cos_full", "cos_trunc"
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("cos_full"), F.asc("neighbor_id"))
    wt = W.partitionBy("query_id").orderBy(F.desc("cos_trunc"), F.asc("neighbor_id"))
    rf = pairs.select(
        "query_id", "neighbor_id", F.row_number().over(wf).alias("r")
    ).filter(F.col("r") <= TOP_K)
    rt = pairs.select(
        "query_id", "neighbor_id", F.row_number().over(wt).alias("r")
    ).filter(F.col("r") <= TOP_K)
    return (
        rf.join(
            rt.select(F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")),
            (F.col("query_id") == F.col("q2")) & (F.col("neighbor_id") == F.col("n2")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("n2").cast("long").alias("n_overlap"),
            pround(F.count("n2").cast("double") / F.lit(float(TOP_K)), 2).alias(
                "recall_at_10"
            ),
        )
        .orderBy("query_id")
    )
