"""Corpus-curation operators (round 5, second half): unigram rarity
scoring (the rational perplexity proxy), deterministic global training
shuffle, per-source length winsorisation, and a PII scan over every
text-bearing column.

House rules as everywhere else: JVM-side expressions only, rational
arithmetic (no ln/exp — libm vs JVM transcendentals differ by 1 ulp;
sqrt IS exact per IEEE-754 and allowed), exact int64 fixed-point sums
before any division, and a mirrored DuckDB oracle per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..registry import query
from .text import _DOC_BASE_SQL, _doc_base

# ---------------------------------------------------------------------------
# Unigram rarity — the rational stand-in for a unigram-LM perplexity
# score (CCNet-style quality signal). For each document: the exact sum
# of corpus frequencies of its tokens, the mean token frequency, and
# the share of "rare" tokens (corpus count * 1000 < corpus token total
# — an integer cross-multiplication, no float threshold). The vocab
# table is tiny (it is an aggregate over tokens) and broadcast into
# the per-token join; the only wide shuffles are the two token
# aggregations, both with map-side partial aggregation.
# ---------------------------------------------------------------------------


@query(
    "doc_unigram_rarity",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
toks AS (
  SELECT doc_id, unnest(toks) AS word FROM base
), vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word
), tot AS (
  SELECT CAST(sum(freq) AS BIGINT) AS t FROM vocab
), flagged AS (
  SELECT t.doc_id, v.freq,
         CASE WHEN v.freq * 1000 < tot.t THEN 1 ELSE 0 END AS is_rare
  FROM toks t JOIN vocab v ON t.word = v.word CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_toks,
       CAST(sum(freq) AS BIGINT) AS sum_freq,
       {R("(CAST(sum(freq) AS DOUBLE) / CAST(count(*) AS DOUBLE))", 4)}
         AS mean_tok_freq,
       {R("(CAST(sum(is_rare) AS DOUBLE) / CAST(count(*) AS DOUBLE))", 6)}
         AS rare_ratio
FROM flagged
GROUP BY doc_id
""",
)
def doc_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    toks = base.select("doc_id", F.explode("toks").alias("word"))
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    # corpus token total: singleton aggregate, broadcast cross join
    tot = vocab.agg(F.sum("freq").cast("long").alias("t"))
    flagged = (
        toks.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "freq",
            F.when(F.col("freq") * 1000 < F.col("t"), 1).otherwise(0).alias("is_rare"),
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("freq").cast("long").alias("sum_freq"),
            pround(
                F.sum("freq").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("mean_tok_freq"),
            pround(
                F.sum("is_rare").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("rare_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic global training shuffle. Every epoch-shuffle in an LLM
# data pipeline needs a reproducible total order that does NOT sort the
# corpus through one task. Two-pass distributed prefix sum (same
# pattern as doc_greedy_packing_sharded / abc_part_classification):
# md5(doc_id) is the shuffle key; its first hex pair is one of 256
# ordered buckets; rank within bucket via a bucket-partitioned window;
# bucket offsets from an exclusive prefix sum over the 256-row count
# aggregate. shuffle_pos is the exact global rank the full sort would
# give — without a global sort.
# ---------------------------------------------------------------------------


@query(
    "doc_global_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
  FROM documents
), counts AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM keyed GROUP BY bucket
), offsets AS (
  SELECT bucket,
         CAST(coalesce(sum(n) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM counts
)
SELECT k.doc_id, k.bucket,
       CAST(o.off + row_number() OVER (PARTITION BY k.bucket
         ORDER BY k.skey, k.doc_id) AS BIGINT) AS shuffle_pos
FROM keyed k JOIN offsets o ON k.bucket = o.bucket
ORDER BY shuffle_pos
""",
)
def doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("bucket"),
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # exclusive prefix sum over <=256 rows — bounded single-partition window
    woff = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(woff), F.lit(0)).cast("long").alias("off")
    )
    wrank = W.partitionBy("bucket").orderBy("skey", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("off") + F.row_number().over(wrank)).cast("long").alias(
                "shuffle_pos"
            ),
        )
        .orderBy("shuffle_pos")
    )


# ---------------------------------------------------------------------------
# Per-source length winsorisation report: exact p05/p95 of n_chars per
# source, then a kept / too-short / too-long census against those
# fences — the outlier-trim step of a curation funnel. The percentile
# aggregate shuffles once on source; the classification join broadcasts
# the per-source fences back onto the scan.
# ---------------------------------------------------------------------------


@query(
    "corpus_length_trim",
    oracle=f"""
WITH fences AS (
  SELECT source,
         {R("quantile_cont(n_chars, 0.05)", 4)} AS p05,
         {R("quantile_cont(n_chars, 0.95)", 4)} AS p95
  FROM documents GROUP BY source
)
SELECT d.source,
       any_value(f.p05) AS p05,
       any_value(f.p95) AS p95,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.n_chars < f.p05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_too_short,
       CAST(sum(CASE WHEN d.n_chars > f.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_too_long,
       CAST(sum(CASE WHEN d.n_chars >= f.p05 AND d.n_chars <= f.p95
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN fences f ON d.source = f.source
GROUP BY d.source
ORDER BY d.source
""",
)
def corpus_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    fences = docs.groupBy("source").agg(
        pround(F.expr("percentile(n_chars, 0.05)"), 4).alias("p05"),
        pround(F.expr("percentile(n_chars, 0.95)"), 4).alias("p95"),
    )
    return (
        docs.join(F.broadcast(fences), "source")
        .groupBy("source")
        .agg(
            F.any_value("p05").alias("p05"),
            F.any_value("p95").alias("p95"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") < F.col("p05"), 1).otherwise(0))
            .cast("long")
            .alias("n_too_short"),
            F.sum(F.when(F.col("n_chars") > F.col("p95"), 1).otherwise(0))
            .cast("long")
            .alias("n_too_long"),
            F.sum(
                F.when(
                    (F.col("n_chars") >= F.col("p05"))
                    & (F.col("n_chars") <= F.col("p95")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII scan across every text-bearing column (documents.text,
# customer.c_name, events.props). Patterns are kept to the regex
# subset Java's engine and DuckDB's RE2 agree on (no lookaround, no
# backrefs). The redaction counterpart lives in functions/pii.py and
# is unit-tested on synthetic PII; this query is the fleet-wide scan
# report a pipeline runs before export.
# ---------------------------------------------------------------------------

from ..functions.pii import PII_PATTERNS  # noqa: E402


def _pii_scan_sql(table: str, col: str) -> str:
    kinds = ",\n".join(
        f"      ('{kind}', len(regexp_extract_all({col}, '{pat}'))) "
        for kind, pat in PII_PATTERNS.items()
    )
    return f"""
  SELECT '{table}' AS tbl, k.kind AS kind,
         CAST(sum(CASE WHEN k.n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_hit,
         CAST(sum(k.n) AS BIGINT) AS n_matches
  FROM {table}, LATERAL (VALUES
{kinds}
  ) AS k(kind, n)
  GROUP BY k.kind
"""


@query(
    "pii_scan_tables",
    oracle=(
        _pii_scan_sql("documents", "text")
        + "UNION ALL"
        + _pii_scan_sql("customer", "c_name")
        + "UNION ALL"
        + _pii_scan_sql("events", "props")
        + "ORDER BY tbl, kind"
    ),
)
def pii_scan_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    def scan(table: str, col: str) -> DataFrame:
        df = load_table(spark, sf_dir, table).select(F.col(col).alias("s"))
        per_kind = [
            df.select(
                F.lit(table).alias("tbl"),
                F.lit(kind).alias("kind"),
                F.size(F.regexp_extract_all("s", F.lit(pat), 0)).alias("n"),
            )
            for kind, pat in PII_PATTERNS.items()
        ]
        out = per_kind[0]
        for p in per_kind[1:]:
            out = out.unionAll(p)
        return out

    scans = scan("documents", "text").unionAll(scan("customer", "c_name")).unionAll(
        scan("events", "props")
    )
    return (
        scans.groupBy("tbl", "kind")
        .agg(
            F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_rows_hit"),
            F.sum("n").cast("long").alias("n_matches"),
        )
        .orderBy("tbl", "kind")
    )


# ---------------------------------------------------------------------------
# Crawl novelty (round 6): per document, the fraction of its word
# 3-gram shingles that no EARLIER document (doc_id order = ingest
# order) contains — the incremental-crawl signal for "is this batch
# adding new content or re-crawling what we have". A shingle's first
# owner is min(doc_id): one map-combinable aggregate over the
# inverted index, then an equi-join back — no per-pair work at all,
# so the operator is linear in corpus shingle volume and immune to
# hot shingles (contrast jaccard_pairs' capped self-join).
# ---------------------------------------------------------------------------

from ..functions.text import sql_word_shingles, word_shingles  # noqa: E402


@query(
    "doc_novelty_by_order",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sh AS (
  SELECT DISTINCT doc_id, unnest({sql_word_shingles("toks", 3)}) AS sh FROM base
), first AS (
  SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       {R("(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)"
          " / CAST(count(*) AS DOUBLE))", 6)} AS novelty_ratio
FROM sh s JOIN first f ON s.sh = f.sh
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def doc_novelty_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir).withColumn("shingles", word_shingles("toks", 3))
    sh = base.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("sh")
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_ratio",
            pround(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source overlap (round 6): EXACT shingle-set Jaccard between
# every pair of sources — "how much of source B is already in source
# A" for dataset-mixing decisions. The per-shingle source list is the
# inverted index again; pair fan-out per shingle is bounded by the
# SOURCE count (not doc count), so the self-join is C(n_sources, 2)
# per shingle at worst — safe at any corpus size for catalog-scale
# source counts. Output is O(n_sources²) rows.
# ---------------------------------------------------------------------------


@query(
    "corpus_cross_source_overlap",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sh AS (
  SELECT DISTINCT source, unnest({sql_word_shingles("toks", 3)}) AS sh FROM base
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY src_a, src_b
)
SELECT src_a, src_b, common, sa.n AS n_a, sb.n AS n_b,
       {R("(CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE))", 6)}
         AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
""",
)
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir).withColumn("shingles", word_shingles("toks", 3))
    sh = base.select(
        "source", F.explode(F.array_distinct("shingles")).alias("sh")
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "common",
            "n_a",
            "n_b",
            pround(
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Exact stratified sampling (round 6): EXACTLY ceil(10%) of every
# (lang, source) stratum, selected deterministically by md5(doc_id)
# rank — the eval-split builder where binomial drift is unacceptable
# (contrast doc_train_val_split / corpus_mixture_resample, whose
# hash-threshold selection is O(1) per row but only approximately
# sized). Exact-k NEEDS a per-stratum rank: the window partitions by
# stratum, so this is for bounded-size eval strata; for corpus-scale
# strata use the threshold samplers (documented trade). Selection
# test `10*rk <= n+9` is the integer form of rk <= ceil(n/10) — no
# float thresholds anywhere.
# ---------------------------------------------------------------------------


@query(
    "stratified_sample_exact",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
         count(*) OVER (PARTITION BY lang, source) AS n_stratum
  FROM documents
)
SELECT doc_id, lang, source,
       CAST(n_stratum AS BIGINT) AS n_stratum,
       CAST(CASE WHEN 10 * rk <= n_stratum + 9 THEN 1 ELSE 0 END AS INT)
         AS is_sampled
FROM ranked
ORDER BY doc_id
""",
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    w = W.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    wc = W.partitionBy("lang", "source")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .withColumn("n_stratum", F.count(F.lit(1)).over(wc).cast("long"))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_stratum",
            (F.lit(10) * F.col("rk") <= F.col("n_stratum") + 9)
            .cast("int")
            .alias("is_sampled"),
        )
    )
