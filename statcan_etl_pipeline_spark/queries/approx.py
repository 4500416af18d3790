"""Approximate aggregates — the 100 TB substitutes for exact distinct
counts and percentiles.

- approx_count_distinct: HyperLogLog++ (rsd 2%) — constant memory vs
  the O(distinct) hash set an exact count needs per group.
- percentile_approx: Greenwald-Khanna — single pass, no full sort.

The raw sketch estimates are engine-private (Spark's HLL++/GK registers
can never hash-match DuckDB's HLL/t-digest), so instead of emitting the
estimates these queries emit *error-band verdicts*: the exact answer
(portable integer arithmetic, identical in both engines) plus a
`*_within_band` boolean recording that the engine's OWN sketch landed
inside its OWN published guarantee. Each engine evaluates its local
sketch against its local band — Spark: 3·rsd for HLL++, rank error
n/accuracy (+1 slack) for GK; DuckDB: the same 6% relative band for its
HLL, a 1% rank band for its t-digest (t-digest has no hard guarantee;
1% is far above its observed mid-quantile error). A sketch regression
in either engine flips a boolean and fails the driver's hash gate.
tests/test_approx.py additionally bounds the raw estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import sql_round
from ..registry import query


@query(
    "approx_distinct_parts_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       -- DuckDB's own HLL vs the shared 6% relative band, integer math
       abs(CAST(approx_count_distinct(l_partkey) AS BIGINT)
           - count(DISTINCT l_partkey)) * 100
         <= 6 * count(DISTINCT l_partkey) AS parts_within_band,
       abs(CAST(approx_count_distinct(l_orderkey) AS BIGINT)
           - count(DISTINCT l_orderkey)) * 100
         <= 6 * count(DISTINCT l_orderkey) AS orders_within_band
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def approx_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count audit: exact counts + within-band verdicts.

    `abs(approx-exact)*100 <= 6*exact` is pure integer arithmetic, so
    the verdict itself is engine-portable; the 6% band is 3× the rsd
    requested from Spark's sketch (≈3σ) and comfortably above DuckDB's
    default HLL error. Scale: one groupBy — the whole point of the
    sketch is O(1) state per group where countDistinct carries the
    O(distinct) set (exact columns here are the audit's ground truth)."""
    li = load_table(spark, sf_dir, "lineitem")
    ep = F.count_distinct(F.col("l_partkey")).cast("long")
    eo = F.count_distinct(F.col("l_orderkey")).cast("long")
    ap = F.approx_count_distinct("l_partkey", rsd=0.02).cast("long")
    ao = F.approx_count_distinct("l_orderkey", rsd=0.02).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            ep.alias("exact_parts"),
            eo.alias("exact_orders"),
            (F.abs(ap - ep) * 100 <= 6 * ep).alias("parts_within_band"),
            (F.abs(ao - eo) * 100 <= 6 * eo).alias("orders_within_band"),
        )
        .orderBy("l_returnflag")
    )


# GK accuracy parameter (Spark) and the derived rank-tolerance bands.
# Spark guarantee: rank error <= n/accuracy (+1 slack for the floor/ceil
# rank convention); DuckDB t-digest band: 1% of n (+1), far above its
# observed error at mid/upper quantiles.
GK_ACCURACY = 10000


def _quantile_band_oracle() -> str:
    # integer ceil(a/b) = (a + b - 1) // b throughout — no float ranks
    return f"""
WITH j AS (
  SELECT c.c_mktsegment AS segment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS pc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n,
         CAST(approx_quantile(pc, 0.5) AS BIGINT) AS a50,
         CAST(approx_quantile(pc, 0.9) AS BIGINT) AS a90
  FROM j GROUP BY segment
), t AS (
  SELECT segment, n, a50, a90,
         (n + 1) // 2 AS k50, (9 * n + 9) // 10 AS k90,
         (n + 99) // 100 + 1 AS tol
  FROM g
), r AS (
  SELECT j.segment, j.pc, row_number() OVER (PARTITION BY j.segment ORDER BY j.pc) AS rn
  FROM j
), chk AS (
  SELECT r.segment,
         max(t.n) AS n_orders,
         max(CASE WHEN r.rn = t.k50 THEN r.pc END) AS e50,
         max(CASE WHEN r.rn = t.k90 THEN r.pc END) AS e90,
         CAST(sum(CASE WHEN r.pc < t.a50 THEN 1 ELSE 0 END) AS BIGINT) AS below50,
         CAST(sum(CASE WHEN r.pc <= t.a50 THEN 1 ELSE 0 END) AS BIGINT) AS atmost50,
         CAST(sum(CASE WHEN r.pc < t.a90 THEN 1 ELSE 0 END) AS BIGINT) AS below90,
         CAST(sum(CASE WHEN r.pc <= t.a90 THEN 1 ELSE 0 END) AS BIGINT) AS atmost90,
         max(t.k50) AS k50, max(t.k90) AS k90, max(t.tol) AS tol
  FROM r JOIN t ON r.segment = t.segment
  GROUP BY r.segment
)
SELECT segment AS c_mktsegment, n_orders,
       {sql_round("CAST(e50 AS DOUBLE) / 100.0", 2)} AS exact_p50,
       (below50 + 1 <= k50 + tol AND atmost50 >= k50 - tol) AS p50_within_band,
       {sql_round("CAST(e90 AS DOUBLE) / 100.0", 2)} AS exact_p90,
       (below90 + 1 <= k90 + tol AND atmost90 >= k90 - tol) AS p90_within_band
FROM chk
ORDER BY c_mktsegment
"""


@query("approx_quantiles_order_value", oracle=_quantile_band_oracle())
def approx_quantiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK percentile audit: exact discrete percentiles + rank-band
    verdicts for the engine's own sketch.

    The approx value's rank interval in the sorted group is
    [below+1, atmost] (ties give it width); the verdict is TRUE iff
    that interval intersects [k - tol, k + tol]. Spark's tol is the GK
    guarantee ceil(n/accuracy)+1; DuckDB's (oracle side) is a 1% band
    for its t-digest. Exact percentiles are discrete order statistics
    on integer cents — no interpolation, so both engines agree bit-for-
    bit. Scale: the rank window partitions by market segment (bounded
    fan-out — |segments| partitions of ~n/|segments| rows); the
    production path at 100 TB is the sketch itself, the exact rank pass
    exists to audit it."""
    from pyspark.sql import Window as W

    from ..functions.portable import cents, pround

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), cents("o_totalprice").alias("pc")
    )
    n = F.count(F.lit(1)).cast("long")
    g = j.groupBy("segment").agg(
        n.alias("n"),
        F.percentile_approx("pc", 0.5, GK_ACCURACY).cast("long").alias("a50"),
        F.percentile_approx("pc", 0.9, GK_ACCURACY).cast("long").alias("a90"),
    )
    t = g.select(
        "segment",
        "n",
        "a50",
        "a90",
        ((F.col("n") + 1) / 2).cast("long").alias("k50"),
        F.floor((9 * F.col("n") + 9) / 10).cast("long").alias("k90"),
        (F.floor((F.col("n") + GK_ACCURACY - 1) / GK_ACCURACY) + 1)
        .cast("long")
        .alias("tol"),
    )
    r = j.select(
        "segment",
        "pc",
        F.row_number().over(W.partitionBy("segment").orderBy("pc")).alias("rn"),
    )
    chk = (
        r.join(F.broadcast(t), "segment")
        .groupBy("segment")
        .agg(
            F.max("n").alias("n_orders"),
            F.max(F.when(F.col("rn") == F.col("k50"), F.col("pc"))).alias("e50"),
            F.max(F.when(F.col("rn") == F.col("k90"), F.col("pc"))).alias("e90"),
            F.sum((F.col("pc") < F.col("a50")).cast("long")).alias("below50"),
            F.sum((F.col("pc") <= F.col("a50")).cast("long")).alias("atmost50"),
            F.sum((F.col("pc") < F.col("a90")).cast("long")).alias("below90"),
            F.sum((F.col("pc") <= F.col("a90")).cast("long")).alias("atmost90"),
            F.max("k50").alias("k50"),
            F.max("k90").alias("k90"),
            F.max("tol").alias("tol"),
        )
    )
    band = lambda lo, hi, k: (  # noqa: E731
        (F.col(lo) + 1 <= F.col(k) + F.col("tol"))
        & (F.col(hi) >= F.col(k) - F.col("tol"))
    )
    return chk.select(
        F.col("segment").alias("c_mktsegment"),
        "n_orders",
        pround(F.col("e50").cast("double") / 100.0, 2).alias("exact_p50"),
        band("below50", "atmost50", "k50").alias("p50_within_band"),
        pround(F.col("e90").cast("double") / 100.0, 2).alias("exact_p90"),
        band("below90", "atmost90", "k90").alias("p90_within_band"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Count-min sketch (round 2): UNLIKE the HLL/GK sketches above, this one
# is built from first principles with md5-derived hash rows, so it IS
# engine-portable and fully oracle-checked. d=4 hash rows × w=256
# buckets; estimate(word) = min over rows of its bucket count. The
# one-sided error guarantee (estimate ≥ exact, overshoot ≤ εN with
# prob 1−δ) is asserted in tests/test_approx.py.
#
# Scale story: the sketch build is one groupBy over (row, bucket) —
# d×w = 1024 counters TOTAL regardless of corpus size, where an exact
# frequency table needs O(vocabulary) state per executor.
# ---------------------------------------------------------------------------
CMS_D = 4    # hash rows
# bucket id from two hex chars of md5 via ascii() — injective on the
# 16-char hex alphabet in BOTH engines, so w = 256 effective buckets
_CMS_BUCKET = "(ascii(substr(md5('cms{d}:' || {col}), 1, 1)) * 128 + ascii(substr(md5('cms{d}:' || {col}), 2, 1)))"

# single source of truth for tokenization: functions/text.py (the Spark
# side uses norm_text/tokens — a drifting hand-inlined copy here would
# silently flake the oracle hash)
from ..functions.text import sql_norm_text, sql_tokens  # noqa: E402

_CMS_TOKS = (
    f"SELECT unnest({sql_tokens(sql_norm_text('text'))}) AS word FROM documents"
)


def _cms_bucket_sql(col: str, d: int) -> str:
    return _CMS_BUCKET.format(d=d, col=col)


@query(
    "cms_word_frequency",
    oracle=f"""
WITH toks AS ({_CMS_TOKS}),
cms AS (
  {" UNION ALL ".join(f"SELECT {d} AS row_id, {_CMS_BUCKET.format(d=d, col='word')} AS bucket, count(*) AS n FROM toks GROUP BY bucket" for d in range(CMS_D))}
),
exact AS (SELECT word, count(*) AS exact_n FROM toks GROUP BY word),
wb AS (
  {" UNION ALL ".join(f"SELECT word, exact_n, {d} AS row_id, {_CMS_BUCKET.format(d=d, col='word')} AS bucket FROM exact" for d in range(CMS_D))}
)
SELECT word, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(min(n) AS BIGINT) AS cms_n
FROM wb JOIN cms USING (row_id, bucket)
GROUP BY word, exact_n
ORDER BY word
""",
)
def cms_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import scatter
    from ..functions.text import norm_text, tokens

    docs = scatter(spark, load_table(spark, sf_dir, "documents")).withColumn(
        "norm", norm_text("text")
    )
    toks = docs.select(F.explode(tokens("norm")).alias("word"))

    def bucket(col: str, d: int) -> F.Column:
        return F.expr(_cms_bucket_sql(col, d))

    cms = None
    for d in range(CMS_D):
        part = (
            toks.select(F.lit(d).alias("row_id"), bucket("word", d).alias("bucket"))
            .groupBy("row_id", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cms = part if cms is None else cms.unionByName(part)
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    wb = None
    for d in range(CMS_D):
        part = exact.select(
            "word", "exact_n", F.lit(d).alias("row_id"), bucket("word", d).alias("bucket")
        )
        wb = part if wb is None else wb.unionByName(part)
    return (
        wb.join(F.broadcast(cms), ["row_id", "bucket"])
        .groupBy("word", "exact_n")
        .agg(F.min("n").cast("long").alias("cms_n"))
        .select("word", F.col("exact_n").cast("long").alias("exact_n"), "cms_n")
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch (round 2): like the CMS
# above, built from md5 so it is deterministic and FULLY oracle-checked
# (approx_count_distinct's HLL sketch is engine-private; this one isn't).
# Estimator: with h = 32-bit-normalized md5 of the key and h_k the k-th
# smallest distinct hash in a group, E[distinct] ≈ (k-1)·2^32 / h_k.
# Groups with ≤ k distinct hashes are exact by construction.
#
# Scale story: per group the state is a bounded k-item min-heap (here:
# window top-k), vs the O(distinct) set an exact count carries.
# ---------------------------------------------------------------------------
KMV_K = 64
_KMV_EST_SQL = (
    f"(CASE WHEN n_h < {KMV_K} THEN CAST(n_h AS DOUBLE) "
    f"ELSE ({KMV_K} - 1.0) * 4294967296.0 / CAST(h_k AS DOUBLE) END)"
)


def _hex32_sql(h: str) -> str:
    """First 8 hex chars of md5 column `h` as a BIGINT — ascii-based
    digit math only, so the expression parses in Spark SQL AND DuckDB."""
    return "(" + " + ".join(
        f"CAST(ascii(substr({h}, {i + 1}, 1)) - "
        f"CASE WHEN ascii(substr({h}, {i + 1}, 1)) >= 97 THEN 87 ELSE 48 END AS BIGINT)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ) + ")"


@query(
    "kmv_distinct_parts",
    oracle=f"""
WITH hashes AS (
  SELECT DISTINCT l_returnflag,
         {_hex32_sql("md5('kmv:' || CAST(l_partkey AS VARCHAR))")} AS h
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n_h
  FROM hashes
), kth AS (
  SELECT l_returnflag, h AS h_k, n_h FROM ranked
  WHERE rn = CASE WHEN n_h < {KMV_K} THEN n_h ELSE {KMV_K} END
), exact AS (
  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct FROM lineitem
  GROUP BY l_returnflag
)
SELECT k.l_returnflag,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       {sql_round(_KMV_EST_SQL, 2)} AS kmv_estimate
FROM kth k JOIN exact e ON k.l_returnflag = e.l_returnflag
ORDER BY k.l_returnflag
""",
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.portable import pround

    li = load_table(spark, sf_dir, "lineitem")
    h = F.expr(_hex32_sql("md5('kmv:' || CAST(l_partkey AS STRING))"))
    hashes = li.select("l_returnflag", h.alias("h")).distinct()
    wrank = W.partitionBy("l_returnflag").orderBy("h")
    wall = W.partitionBy("l_returnflag")
    ranked = hashes.select(
        "l_returnflag",
        "h",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_h"),
    )
    kth = ranked.filter(
        F.col("rn")
        == F.when(F.col("n_h") < KMV_K, F.col("n_h")).otherwise(F.lit(KMV_K))
    ).select("l_returnflag", F.col("h").alias("h_k"), "n_h")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_h") < KMV_K, F.col("n_h").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(4294967296.0) / F.col("h_k").cast("double")
    )
    return (
        kth.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            pround(est, 2).alias("kmv_estimate"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup — the 100 TB pre-aggregation contract. At
# scale you NEVER re-scan the fact table per reporting cut: you store
# one HLL sketch per fine-grained cell (here (returnflag, linestatus))
# and answer any coarser distinct-count rollup by UNIONING sketches
# (hll_union_agg), which is associative, commutative and tiny
# (2^lgConfigK registers per cell). This query materializes the cell
# sketches, rolls them up per returnflag, and audits the MERGED
# estimate against the exact distinct with the same integer-math 6%
# band as approx_distinct_parts_by_flag. DuckDB has no sketch-merge
# surface, so its oracle evaluates its own flat HLL against the same
# band — each engine certifies its own sketch pipeline, and Spark's
# pipeline is the two-level merge (tests/test_approx.py additionally
# pins merged-vs-direct drift < 2%).
# ---------------------------------------------------------------------------
@query(
    "hll_mergeable_rollup",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_cells,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       abs(CAST(approx_count_distinct(l_partkey) AS BIGINT)
           - count(DISTINCT l_partkey)) * 100
         <= 6 * count(DISTINCT l_partkey) AS merged_within_band
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    rolled = cells.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("long").alias("exact_parts")
    )
    return (
        rolled.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_cells",
            "exact_parts",
            (F.abs(F.col("est") - F.col("exact_parts")) * 100
             <= 6 * F.col("exact_parts")).alias("merged_within_band"),
        )
        .orderBy("l_returnflag")
    )
