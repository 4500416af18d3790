"""Text analysis over the `documents` table: stats, quality scoring,
language-ID heuristic, fingerprinting. All built-in-function (JVM)
expressions — no Python UDFs — with exactly mirrored DuckDB oracles.

The quality score is deliberately RATIONAL arithmetic only (no
exp/ln — JVM and libm transcendentals can differ by 1 ulp); the
sigmoid-ish squash is x/(1+|x|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, scatter
from ..functions.portable import pround, sql_round as R
from ..functions.text import (
    STOPWORDS,
    char_shingles,
    class_count,
    norm_text,
    sql_char_shingles,
    sql_class_count,
    sql_norm_text,
    sql_stopword_hits,
    sql_tokens,
    sql_word_shingles,
    stopword_hits,
    tokens,
    word_shingles,
)
from ..registry import query

PUNCT = ".,;:!?"
_NORM_SQL = sql_norm_text("text")
_DOC_BASE_SQL = f"""
  SELECT doc_id, lang, source, text,
         {_NORM_SQL} AS norm,
         {sql_tokens(_NORM_SQL)} AS toks
  FROM documents
"""


def _doc_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scatter before the regex/tokenize work so it runs wide
    return (
        scatter(spark, load_table(spark, sf_dir, "documents"))
        .withColumn("norm", norm_text("text"))
        .withColumn("toks", tokens("norm"))
    )


# ---------------------------------------------------------------------------
# Per-document statistics
# ---------------------------------------------------------------------------
@query(
    "text_stats",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL})
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT)    AS n_tokens,
       (CAST({sql_class_count("text", PUNCT)} AS DOUBLE)
        / CAST(length(text) AS DOUBLE))  AS punct_ratio,
       (CAST({sql_class_count("text", "0-9")} AS DOUBLE)
        / CAST(length(text) AS DOUBLE))  AS digit_ratio,
       (CAST(length(regexp_replace(norm, ' ', '', 'g')) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE))     AS avg_word_len
FROM base
ORDER BY doc_id
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    n_chars = F.length("text").cast("long")
    n_tokens = F.size("toks").cast("long")
    return base.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (class_count("text", PUNCT).cast("double") / n_chars.cast("double")).alias(
            "punct_ratio"
        ),
        (class_count("text", "0-9").cast("double") / n_chars.cast("double")).alias(
            "digit_ratio"
        ),
        (
            F.length(F.regexp_replace("norm", " ", "")).cast("double")
            / n_tokens.cast("double")
        ).alias("avg_word_len"),
    )  # no trailing global sort: driver hash is order-insensitive


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish sub-word regex count
# (letters runs / digit runs / single punctuation — the pre-tokenizer
# split GPT-style BPE vocabularies assume) + a chars/4 heuristic.
# ---------------------------------------------------------------------------
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


@query(
    "text_token_counts",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL})
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpeish_tokens,
       CAST(floor(length(text) / 4.0) AS BIGINT) AS chars_div4
FROM base
ORDER BY doc_id
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    return base.select(
        "doc_id",
        F.size("toks").cast("long").alias("ws_tokens"),
        # NB: F.lit keeps the backslash intact — a Spark SQL '...' literal
        # would swallow the \s escape (DuckDB literals don't)
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("bpeish_tokens"),
        F.floor(F.length("text") / F.lit(4.0)).cast("long").alias("chars_div4"),
    )


# ---------------------------------------------------------------------------
# Composite quality score (rational sigmoid)
# ---------------------------------------------------------------------------
@query(
    "text_quality_score",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
feats AS (
  SELECT doc_id, lang,
         (CAST({sql_stopword_hits("toks", STOPWORDS["en"])} AS DOUBLE)
          / CAST(len(toks) AS DOUBLE)) AS stop_ratio,
         (CAST({sql_class_count("text", PUNCT)} AS DOUBLE)
          / CAST(length(text) AS DOUBLE)) AS punct_ratio,
         (CAST({sql_class_count("text", "0-9")} AS DOUBLE)
          / CAST(length(text) AS DOUBLE)) AS digit_ratio,
         (CAST(least(len(toks), 200) AS DOUBLE) / 200.0) AS len_feat
  FROM base
), scored AS (
  SELECT doc_id, lang,
         (2.0 * stop_ratio - 4.0 * punct_ratio - 2.0 * digit_ratio + len_feat) AS x
  FROM feats
)
SELECT doc_id, lang,
       {R("(x / (1.0 + abs(x)))", 6)} AS quality
FROM scored
ORDER BY doc_id
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    n_chars = F.length("text").cast("double")
    n_tokens = F.size("toks")
    stop_ratio = stopword_hits("toks", STOPWORDS["en"]).cast("double") / n_tokens.cast(
        "double"
    )
    punct_ratio = class_count("text", PUNCT).cast("double") / n_chars
    digit_ratio = class_count("text", "0-9").cast("double") / n_chars
    len_feat = F.least(n_tokens, F.lit(200)).cast("double") / F.lit(200.0)
    x = (
        F.lit(2.0) * stop_ratio
        - F.lit(4.0) * punct_ratio
        - F.lit(2.0) * digit_ratio
        + len_feat
    )
    return base.select(
        "doc_id", "lang", pround(x / (F.lit(1.0) + F.abs(x)), 6).alias("quality")
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (stopword hit argmax, fixed priority ties)
# ---------------------------------------------------------------------------
@query(
    "text_langid",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
hits AS (
  SELECT doc_id, lang,
         {sql_stopword_hits("toks", STOPWORDS["en"])} AS hits_en,
         {sql_stopword_hits("toks", STOPWORDS["fr"])} AS hits_fr,
         {sql_stopword_hits("toks", STOPWORDS["de"])} AS hits_de,
         {sql_stopword_hits("toks", STOPWORDS["es"])} AS hits_es
  FROM base
)
SELECT doc_id, lang AS actual_lang, hits_en, hits_fr, hits_de, hits_es,
       CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es THEN 'en'
            WHEN hits_fr >= hits_de AND hits_fr >= hits_es THEN 'fr'
            WHEN hits_de >= hits_es THEN 'de'
            ELSE 'es' END AS guess
FROM hits
ORDER BY doc_id
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    hits = base.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        stopword_hits("toks", STOPWORDS["en"]).alias("hits_en"),
        stopword_hits("toks", STOPWORDS["fr"]).alias("hits_fr"),
        stopword_hits("toks", STOPWORDS["de"]).alias("hits_de"),
        stopword_hits("toks", STOPWORDS["es"]).alias("hits_es"),
    )
    guess = (
        F.when(
            (F.col("hits_en") >= F.col("hits_fr"))
            & (F.col("hits_en") >= F.col("hits_de"))
            & (F.col("hits_en") >= F.col("hits_es")),
            "en",
        )
        .when(
            (F.col("hits_fr") >= F.col("hits_de"))
            & (F.col("hits_fr") >= F.col("hits_es")),
            "fr",
        )
        .when(F.col("hits_de") >= F.col("hits_es"), "de")
        .otherwise("es")
    )
    return hits.withColumn("guess", guess)


# ---------------------------------------------------------------------------
# Repetition ratio: 1 - distinct/total word 3-grams (template/spam signal)
# ---------------------------------------------------------------------------
@query(
    "text_repetition_ratio",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sh AS (
  SELECT doc_id, {sql_word_shingles("toks", 3)} AS sh FROM base
)
SELECT doc_id,
       CAST(len(sh) AS BIGINT) AS total_3grams,
       CAST(len(list_distinct(sh)) AS BIGINT) AS distinct_3grams,
       CASE WHEN len(sh) > 0
            THEN 1.0 - (CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE))
            ELSE 0.0 END AS repetition_ratio
FROM sh
ORDER BY doc_id
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir).withColumn("sh", word_shingles("toks", 3))
    total = F.size("sh").cast("long")
    distinct = F.size(F.array_distinct("sh")).cast("long")
    ratio = F.when(
        total > 0, F.lit(1.0) - (distinct.cast("double") / total.cast("double"))
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        total.alias("total_3grams"),
        distinct.alias("distinct_3grams"),
        ratio.alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# Corpus-level: top-40 words (explode → count → deterministic top-k)
# ---------------------------------------------------------------------------
@query(
    "corpus_top_words",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
words AS (SELECT unnest(toks) AS word FROM base)
SELECT word, count(*) AS n
FROM words
GROUP BY word
ORDER BY n DESC, word
LIMIT 40
""",
)
def corpus_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    return (
        base.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# TF-IDF (linear idf = N/df: pure integer-ratio arithmetic — portable,
# unlike ln() whose libm vs JVM results can differ by 1 ulp): top-3
# scoring terms per document.
# ---------------------------------------------------------------------------
@query(
    "tfidf_top_terms",
    oracle="""
WITH base AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), tf AS (
  SELECT doc_id, unnest(toks) AS word FROM base
), tfc AS (
  SELECT doc_id, word, count(*) AS tf FROM tf GROUP BY doc_id, word
), df AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM tfc GROUP BY word
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tfc.word AS word,
         (CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))) AS tfidf
  FROM tfc, df, n WHERE tfc.word = df.word
), ranked AS (
  SELECT doc_id, word, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS BIGINT) AS rn
  FROM scored
)
SELECT doc_id, word, tfidf, rn FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = _doc_base(spark, sf_dir)
    tfc = (
        base.select("doc_id", F.explode("toks").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tfc is keyed by (doc_id, word), so df = count(*) — the
    # countDistinct(doc_id) the oracle spells would plan an extra
    # partial-distinct hash pass over input that is already distinct
    # (r14, guide §2.3; interleaved A/B won all three pairs,
    # 2.79/1.77/1.30 → 2.52/1.35/1.14 s, output identical).
    dfc = tfc.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # fold N into the plan as a broadcast 1-row aggregate (same pattern as
    # gini_customer_revenue) — a separate eager .count() would cost a whole
    # extra scan job per invocation
    n_docs = F.broadcast(
        load_table(spark, sf_dir, "documents").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
    )
    scored = (
        tfc.join(dfc, "word")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "word",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf", "rn")
    )


# ---------------------------------------------------------------------------
# Fingerprints: md5 of normalized text + min-of-char-5-gram-hash sketch
# ---------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL})
SELECT doc_id,
       md5(norm) AS fp,
       list_min(list_transform({sql_char_shingles("norm", 5)}, s -> md5(s))) AS min_shingle_hash
FROM base
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    return base.select(
        "doc_id",
        F.md5(F.col("norm").cast("binary")).alias("fp"),
        F.array_min(
            F.transform(char_shingles("norm", 5), lambda s: F.md5(s.cast("binary")))
        ).alias("min_shingle_hash"),
    )


# ---------------------------------------------------------------------------
# Corpus quality filter funnel (round 2): first-failing-rule verdict per
# document (the standard LLM-data-pipeline keep/drop report). Rules and
# thresholds are tuned to the corpus feature ranges (10-99 tokens,
# stopword ratio ~0.06): too_short < 20 toks, too_long > 90 toks,
# low_stopword < 0.04. The CASE chain is evaluated identically on both
# engines; the ratio compare divides two exact integers.
# ---------------------------------------------------------------------------
@query(
    "corpus_quality_filter",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
v AS (
  SELECT source,
         CASE
           WHEN len(toks) < 20 THEN 'too_short'
           WHEN len(toks) > 90 THEN 'too_long'
           WHEN CAST({sql_stopword_hits("toks", STOPWORDS["en"])} AS DOUBLE)
                / CAST(len(toks) AS DOUBLE) < 0.04 THEN 'low_stopword'
           ELSE 'keep'
         END AS verdict,
         len(toks) AS n_toks
  FROM base
)
SELECT source, verdict,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM v
GROUP BY source, verdict
ORDER BY source, verdict
""",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    n_toks = F.size("toks")
    stop_ratio = stopword_hits("toks", STOPWORDS["en"]).cast("double") / n_toks.cast(
        "double"
    )
    verdict = (
        F.when(n_toks < 20, "too_short")
        .when(n_toks > 90, "too_long")
        .when(stop_ratio < 0.04, "low_stopword")
        .otherwise("keep")
    )
    return (
        base.select("source", verdict.alias("verdict"), n_toks.alias("n_toks"))
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "verdict")
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics per source: token count, distinct types,
# hapax legomena (frequency-1 types), type/token ratio. Classic corpus
# profiling; the TTR division is exact-int / exact-int.
# ---------------------------------------------------------------------------
@query(
    "corpus_vocab_stats",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
words AS (SELECT source, unnest(toks) AS word FROM base),
freq AS (SELECT source, word, count(*) AS n FROM words GROUP BY source, word)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax,
       {R("(CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE))", 6)} AS type_token_ratio
FROM freq
GROUP BY source
ORDER BY source
""",
)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    freq = (
        base.select("source", F.explode("toks").alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        freq.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.count(F.when(F.col("n") == 1, 1)).cast("long").alias("n_hapax"),
            pround(
                F.count(F.lit(1)).cast("double") / F.sum("n").cast("double"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Document chunking (round 2): fixed-size token windows with overlap —
# the standard training-data prep step (context-window packing). Chunk
# starts stride by (size - overlap); the tail keeps partial chunks so
# no token is dropped. All JVM array ops (sequence/slice/concat_ws).
# ---------------------------------------------------------------------------
_CHUNK = 32
_OVERLAP = 8
_STRIDE = _CHUNK - _OVERLAP


@query(
    "doc_token_chunks",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
starts AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {_OVERLAP}, 1) + {_STRIDE} - 1, {_STRIDE})) AS start
  FROM base
)
SELECT doc_id,
       CAST((start - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(toks[start:start+{_CHUNK - 1}]) AS BIGINT) AS n_tokens,
       array_to_string(toks[start:start+{_CHUNK - 1}], ' ') AS chunk_text
FROM starts
WHERE start = 1 OR start <= len(toks) - {_OVERLAP}
ORDER BY doc_id, chunk_idx
""",
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    # chunk start positions 1, 1+stride, ... while start <= n_toks
    starts = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("toks") - F.lit(_OVERLAP), F.lit(1))
                + F.lit(_STRIDE - 1),
                F.lit(_STRIDE),
            )
        ).alias("start"),
    ).filter(
        # A start past len-overlap would yield a chunk fully contained in
        # the previous one (pure duplicate content); keep start=1 so short
        # docs still emit their single chunk.
        (F.col("start") == 1) | (F.col("start") <= F.size("toks") - F.lit(_OVERLAP))
    )
    chunk = F.slice(F.col("toks"), F.col("start"), _CHUNK)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / F.lit(_STRIDE)).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check (round 2): fraction of each document's
# word 8-grams that appear in a "benchmark" set (docs 0-9 stand in for
# an eval set) — the decontamination pass every LLM training pipeline
# runs. Inverted-index shingle join against the DISTINCT benchmark
# n-grams (broadcast — the benchmark is tiny next to the corpus).
# ---------------------------------------------------------------------------
_CONTAM_N = 8


@query(
    "contamination_check",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
grams AS (
  SELECT doc_id, unnest({sql_word_shingles("toks", _CONTAM_N)}) AS g FROM base
),
doc_grams AS (SELECT DISTINCT doc_id, g FROM grams),
bench AS (SELECT DISTINCT g FROM doc_grams WHERE doc_id < 10),
per_doc AS (SELECT doc_id, count(*) AS n_grams FROM doc_grams GROUP BY doc_id),
hits AS (
  SELECT d.doc_id, count(*) AS n_hits
  FROM doc_grams d JOIN bench b ON d.g = b.g
  WHERE d.doc_id >= 10
  GROUP BY d.doc_id
)
SELECT p.doc_id,
       CAST(p.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_contaminated,
       {R("(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE))", 6)} AS contamination
FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id
WHERE p.doc_id >= 10 AND p.n_grams > 0
ORDER BY p.doc_id
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    grams = base.select(
        "doc_id", F.explode(word_shingles("toks", _CONTAM_N)).alias("g")
    )
    doc_grams = grams.distinct()
    bench = doc_grams.filter(F.col("doc_id") < 10).select("g").distinct()
    per_doc = (
        doc_grams.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .filter((F.col("doc_id") >= 10) & (F.col("n_grams") > 0))
    )
    hits = (
        doc_grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_contaminated"),
            pround(
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy sequential packing (round 2): pack documents into fixed-token
# training bins in doc_id order per source — running token cumsum
# div capacity assigns the bin; integer-only so both engines agree
# exactly. (True FFD needs a sequential pass; the greedy-streaming form
# is what a distributed pipeline actually runs — one window per
# source partition, no global state.)
# ---------------------------------------------------------------------------
_PACK_CAP = 256


@query(
    "doc_greedy_packing",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sized AS (
  SELECT source, doc_id, len(toks) AS n_toks FROM base
), placed AS (
  SELECT source, doc_id, n_toks,
         CAST(coalesce(sum(n_toks) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS toks_before
  FROM sized
)
SELECT source,
       CAST(floor(toks_before / {_PACK_CAP}.0) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM placed
GROUP BY source, bin_id
ORDER BY source, bin_id
""",
)
def doc_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-window form; clear but serializes each source through one
    task (W.partitionBy('source')). Use doc_greedy_packing_sharded for
    the scale path."""
    from pyspark.sql import Window as W

    base = _doc_base(spark, sf_dir)
    sized = base.select("source", "doc_id", F.size("toks").alias("n_toks"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    placed = sized.withColumn(
        "toks_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)).cast("long")
    )
    return (
        placed.select(
            "source",
            (F.col("toks_before") / F.lit(_PACK_CAP)).cast("long").alias("bin_id"),
            "n_toks",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# Sharded greedy packing (round 5): the scale path. The plain form's
# W.partitionBy("source") serializes each source through ONE task — at
# 100 TB a big source is a straggler that never finishes. Classic
# two-pass distributed prefix sum instead:
#   pass 1: shard rows by pmod(doc_id, K) within source; cumulative sum
#           WITHIN each (source, shard) — K-way parallel per source;
#   pass 2: exclusive prefix sum over the K per-shard totals (a tiny
#           aggregate, broadcast back) offsets each shard's positions.
# Packing order is shard-major (shard 0's docs, then shard 1's, ...) —
# a different but equally deterministic order than the plain form; the
# oracle mirrors the same arithmetic. At cluster scale, persist the
# `sized` projection (4 scalar cols) so the tiny totals branch doesn't
# re-tokenize the corpus.
# ---------------------------------------------------------------------------
_PACK_SHARDS = 8


@query(
    "doc_greedy_packing_sharded",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sized AS (
  SELECT source, doc_id, len(toks) AS n_toks,
         doc_id % {_PACK_SHARDS} AS shard
  FROM base
),
local AS (
  SELECT source, shard, doc_id, n_toks,
         CAST(coalesce(sum(n_toks) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS local_before
  FROM sized
),
shard_totals AS (
  SELECT source, shard, sum(n_toks) AS shard_toks FROM sized GROUP BY source, shard
),
offsets AS (
  SELECT source, shard,
         CAST(coalesce(sum(shard_toks) OVER (
           PARTITION BY source ORDER BY shard
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS shard_offset
  FROM shard_totals
),
placed AS (
  SELECT l.source, l.n_toks, o.shard_offset + l.local_before AS toks_before
  FROM local l JOIN offsets o ON l.source = o.source AND l.shard = o.shard
)
SELECT source,
       CAST(floor(toks_before / {_PACK_CAP}.0) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM placed
GROUP BY source, bin_id
ORDER BY source, bin_id
""",
)
def doc_greedy_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = _doc_base(spark, sf_dir)
    sized = base.select(
        "source",
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).alias("shard"),
    )
    w_local = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "local_before",
        F.coalesce(F.sum("n_toks").over(w_local), F.lit(0)).cast("long"),
    )
    shard_totals = sized.groupBy("source", "shard").agg(
        F.sum("n_toks").alias("shard_toks")
    )
    # K rows per source — the window is over a tiny aggregate, not rows
    w_off = (
        W.partitionBy("source").orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = shard_totals.withColumn(
        "shard_offset",
        F.coalesce(F.sum("shard_toks").over(w_off), F.lit(0)).cast("long"),
    ).select("source", "shard", "shard_offset")
    placed = local.join(F.broadcast(offsets), ["source", "shard"]).select(
        "source",
        "n_toks",
        ((F.col("shard_offset") + F.col("local_before")) / F.lit(_PACK_CAP))
        .cast("long")
        .alias("bin_id"),
    )
    return (
        placed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# Mixture resampling (round 5): rebalance the corpus toward a UNIFORM
# language mixture by deterministic hash sampling — the data-mixing
# step of a training-data pipeline. Each language keeps documents with
# probability p = min(1, target_share / actual_share); the keep
# decision is a pure function of doc_id (md5 prefix compared against a
# per-language hex threshold), so the sample is reproducible across
# engines and across reruns — no rand(), no seed plumbing. Shuffles:
# one tiny lang-count aggregate (broadcast back) + one final group-by.
# At 100 TB the doc scan is embarrassingly parallel and the decision
# is a per-row expression — no global state.
# ---------------------------------------------------------------------------
_MIX_SCALE = 16777216  # 16^6: md5 6-hex-digit prefix space


@query(
    "corpus_mixture_resample",
    oracle=f"""
WITH lc AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM lc
), thr AS (
  SELECT lc.lang, lc.n_docs,
         CASE WHEN lc.n_docs * tot.n_langs <= tot.total THEN NULL
              ELSE lpad(lower(hex(CAST(floor(
                     (CAST(tot.total AS DOUBLE) / tot.n_langs / lc.n_docs)
                     * {_MIX_SCALE}) AS BIGINT))), 6, '0')
         END AS keep_thr
  FROM lc, tot
), decided AS (
  SELECT d.lang,
         CASE WHEN t.keep_thr IS NULL THEN 1
              WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < t.keep_thr
              THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN thr t ON d.lang = t.lang
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_kept
FROM decided GROUP BY lang ORDER BY lang
""",
)
def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts before/after uniform-mixture downsampling.
    NULL threshold = language at-or-under its target share: keep all."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tot = lc.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    thr = (
        lc.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.when(F.col("n_docs") * F.col("n_langs") <= F.col("total"), F.lit(None))
            .otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.floor(
                                F.col("total").cast("double")
                                / F.col("n_langs")
                                / F.col("n_docs")
                                * F.lit(_MIX_SCALE)
                            ).cast("long")
                        )
                    ),
                    6,
                    "0",
                )
            )
            .alias("keep_thr"),
        )
    )
    decided = docs.join(F.broadcast(thr), "lang").select(
        "lang",
        F.when(F.col("keep_thr").isNull(), F.lit(1))
        .when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
            < F.col("keep_thr"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("kept"),
    )
    return (
        decided.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Boilerplate detection (round 5): the share of each document made of
# CROSS-DOCUMENT repeated word 5-grams (navigation chrome, license
# headers, template text — the stuff quality filters strip before
# training). A shingle is "boilerplate" when it appears in >= 3
# distinct documents. Pure inverted-index shape: explode shingles,
# document-frequency aggregate on the shingle key, semi-join back —
# shuffles only on the shingle hash, no pairwise comparison anywhere.
# ---------------------------------------------------------------------------
_BOILER_DF = 3


@query(
    "boilerplate_ngram_ratio",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
sh AS (
  SELECT DISTINCT doc_id, unnest({sql_word_shingles("toks", 5)}) AS sh FROM base
), dfreq AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh
), per_doc AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN d.df >= {_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler
  FROM sh s JOIN dfreq d ON s.sh = d.sh
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_boiler,
       {R("(CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE))", 6)}
         AS boiler_ratio
FROM per_doc
ORDER BY doc_id
""",
)
def boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    # repartition on the shingle key so the document-frequency aggregate
    # AND the attribution join both consume the SAME shuffle output —
    # without it the regex/explode subtree is recomputed per consumer
    # (2.5× slower at sf0.1, and at 100 TB a full re-tokenize of the
    # corpus per consumer)
    sh = (
        base.select("doc_id", F.explode(word_shingles("toks", 5)).alias("sh"))
        .distinct()
        .repartition("sh")
    )
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= _BOILER_DF, 1).otherwise(0))
            .cast("long")
            .alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        pround(
            F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double"), 6
        ).alias("boiler_ratio"),
    )


# ---------------------------------------------------------------------------
# Train/val/test split (round 5): assign every document to a split by
# a pure function of doc_id — md5 6-hex prefix against fixed hex
# thresholds (test < 1%, val < 2%, else train). No rand(), no seed
# plumbing: the assignment is stable across engines, reruns, and
# repartitions, and adding documents never moves an existing one
# between splits (the property that keeps eval sets uncontaminated
# as the corpus grows). Per-row expression only — embarrassingly
# parallel at 100 TB; the output is the per-(source, split) census.
# ---------------------------------------------------------------------------
_SPLIT_TEST_THR = format(int(0.01 * 16**6), "06x")  # '028f5c'
_SPLIT_VAL_THR = format(int(0.02 * 16**6), "06x")  # '051eb8'
_SPLIT_CASE_SQL = f"""
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{_SPLIT_TEST_THR}'
         THEN 'test'
       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{_SPLIT_VAL_THR}'
         THEN 'val'
       ELSE 'train' END
"""


@query(
    "doc_train_val_split",
    oracle=f"""
WITH assigned AS (
  SELECT source, {_SPLIT_CASE_SQL} AS split FROM documents
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS src_docs
  FROM assigned GROUP BY source
)
SELECT a.source, a.split, CAST(count(*) AS BIGINT) AS n_docs,
       {R("(CAST(count(*) AS DOUBLE) / CAST(any_value(t.src_docs) AS DOUBLE))", 6)}
         AS share
FROM assigned a JOIN tot t ON a.source = t.source
GROUP BY a.source, a.split
ORDER BY a.source, a.split
""",
)
def doc_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, split) document census under the deterministic
    hash split. The split column itself is the per-row expression a
    pipeline would write out partitioned-by."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
    assigned = docs.select(
        "source",
        F.when(prefix < _SPLIT_TEST_THR, F.lit("test"))
        .when(prefix < _SPLIT_VAL_THR, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    tot = assigned.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("src_docs")
    )
    return (
        assigned.groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            "split",
            "n_docs",
            pround(
                F.col("n_docs").cast("double") / F.col("src_docs").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# Per-source corpus report (round 5): the one-table curation dashboard
# — doc/token volume, mean quality, language-ID mismatch rate, exact-
# duplicate rate — per source. Composes the text_quality_score,
# text_langid, and dedup_exact expressions into per-source aggregates;
# every mean goes through the fixed-point micro-sum so the report is
# engine-exact. One shuffle on source (plus the distinct-fingerprint
# sub-aggregate); everything else is per-row expression work.
# ---------------------------------------------------------------------------
_SRC_QUALITY_X_SQL = f"""
  (2.0 * (CAST({sql_stopword_hits("toks", STOPWORDS["en"])} AS DOUBLE)
          / CAST(len(toks) AS DOUBLE))
   - 4.0 * (CAST({sql_class_count("text", PUNCT)} AS DOUBLE)
            / CAST(length(text) AS DOUBLE))
   - 2.0 * (CAST({sql_class_count("text", "0-9")} AS DOUBLE)
            / CAST(length(text) AS DOUBLE))
   + (CAST(least(len(toks), 200) AS DOUBLE) / 200.0))
"""


@query(
    "corpus_source_report",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
scored AS (
  SELECT source, lang, norm, len(toks) AS n_toks,
         {R(f"(({_SRC_QUALITY_X_SQL}) / (1.0 + abs({_SRC_QUALITY_X_SQL})))", 6)}
           AS quality,
         {sql_stopword_hits("toks", STOPWORDS["en"])} AS h_en,
         {sql_stopword_hits("toks", STOPWORDS["fr"])} AS h_fr,
         {sql_stopword_hits("toks", STOPWORDS["de"])} AS h_de,
         {sql_stopword_hits("toks", STOPWORDS["es"])} AS h_es
  FROM base
), lid AS (
  SELECT source, n_toks, quality, norm,
         CASE WHEN (CASE WHEN h_en >= h_fr AND h_en >= h_de AND h_en >= h_es THEN 'en'
                         WHEN h_fr >= h_de AND h_fr >= h_es THEN 'fr'
                         WHEN h_de >= h_es THEN 'de'
                         ELSE 'es' END) = lang THEN 0 ELSE 1 END AS mismatch
  FROM scored
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       {R("(CAST(sum(CAST(CASE WHEN quality >= 0"
          " THEN floor(quality * 1000000.0 + 0.5)"
          " ELSE -floor(-quality * 1000000.0 + 0.5) END AS BIGINT)) AS DOUBLE)"
          " / 1000000.0 / CAST(count(*) AS DOUBLE))", 6)} AS avg_quality,
       {R("(CAST(sum(mismatch) AS DOUBLE) / CAST(count(*) AS DOUBLE))", 6)}
         AS langid_mismatch_rate,
       {R("(1.0 - CAST(count(DISTINCT md5(norm)) AS DOUBLE)"
          " / CAST(count(*) AS DOUBLE))", 6)} AS dup_rate
FROM lid GROUP BY source ORDER BY source
""",
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    n_chars = F.length("text").cast("double")
    n_toks = F.size("toks")
    x = (
        F.lit(2.0)
        * (stopword_hits("toks", STOPWORDS["en"]).cast("double") / n_toks.cast("double"))
        - F.lit(4.0) * (class_count("text", PUNCT).cast("double") / n_chars)
        - F.lit(2.0) * (class_count("text", "0-9").cast("double") / n_chars)
        + F.least(n_toks, F.lit(200)).cast("double") / F.lit(200.0)
    )
    hits = {k: stopword_hits("toks", STOPWORDS[k]) for k in ("en", "fr", "de", "es")}
    guess = (
        F.when(
            (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["es"]),
            "en",
        )
        .when((hits["fr"] >= hits["de"]) & (hits["fr"] >= hits["es"]), "fr")
        .when(hits["de"] >= hits["es"], "de")
        .otherwise("es")
    )
    quality = pround(x / (F.lit(1.0) + F.abs(x)), 6)
    scored = base.select(
        "source",
        "norm",
        n_toks.cast("long").alias("n_toks"),
        quality.alias("quality"),
        F.when(guess == F.col("lang"), 0).otherwise(1).alias("mismatch"),
    )
    qmicro = (
        F.when(
            F.col("quality") >= 0,
            F.floor(F.col("quality") * F.lit(1e6) + F.lit(0.5)),
        )
        .otherwise(-F.floor(-F.col("quality") * F.lit(1e6) + F.lit(0.5)))
        .cast("long")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(qmicro).alias("q_micro"),
            F.sum("mismatch").alias("n_mismatch"),
            F.countDistinct(F.md5(F.col("norm").cast("binary"))).alias("n_fp"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            pround(
                F.col("q_micro").cast("double")
                / F.lit(1e6)
                / F.col("n_docs").cast("double"),
                6,
            ).alias("avg_quality"),
            pround(
                F.col("n_mismatch").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("langid_mismatch_rate"),
            pround(
                F.lit(1.0)
                - F.col("n_fp").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the declared `lang` label vs the
# stopword-argmax guess (same expression as text_langid), aggregated to
# (actual, guess) cells with within-actual shares. The curation QA view
# of the language classifier — one map-combinable aggregation, margins
# broadcast back. Shares are exact-integer ratios rounded once.
# ---------------------------------------------------------------------------


@query(
    "doc_language_confusion",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
hits AS (
  SELECT doc_id, lang,
         {sql_stopword_hits("toks", STOPWORDS["en"])} AS hits_en,
         {sql_stopword_hits("toks", STOPWORDS["fr"])} AS hits_fr,
         {sql_stopword_hits("toks", STOPWORDS["de"])} AS hits_de,
         {sql_stopword_hits("toks", STOPWORDS["es"])} AS hits_es
  FROM base
), guessed AS (
  SELECT lang AS actual_lang,
         CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es THEN 'en'
              WHEN hits_fr >= hits_de AND hits_fr >= hits_es THEN 'fr'
              WHEN hits_de >= hits_es THEN 'de'
              ELSE 'es' END AS guess
  FROM hits
), cells AS (
  SELECT actual_lang, guess, CAST(count(*) AS BIGINT) AS n
  FROM guessed GROUP BY actual_lang, guess
), margins AS (
  SELECT actual_lang, CAST(sum(n) AS BIGINT) AS n_actual FROM cells GROUP BY actual_lang
)
SELECT c.actual_lang, c.guess, c.n,
       {R("(CAST(c.n AS DOUBLE) / CAST(m.n_actual AS DOUBLE))", 6)} AS share
FROM cells c JOIN margins m ON c.actual_lang = m.actual_lang
ORDER BY c.actual_lang, c.guess
""",
)
def doc_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    hits = base.select(
        F.col("lang").alias("actual_lang"),
        stopword_hits("toks", STOPWORDS["en"]).alias("hits_en"),
        stopword_hits("toks", STOPWORDS["fr"]).alias("hits_fr"),
        stopword_hits("toks", STOPWORDS["de"]).alias("hits_de"),
        stopword_hits("toks", STOPWORDS["es"]).alias("hits_es"),
    )
    guess = (
        F.when(
            (F.col("hits_en") >= F.col("hits_fr"))
            & (F.col("hits_en") >= F.col("hits_de"))
            & (F.col("hits_en") >= F.col("hits_es")),
            "en",
        )
        .when(
            (F.col("hits_fr") >= F.col("hits_de"))
            & (F.col("hits_fr") >= F.col("hits_es")),
            "fr",
        )
        .when(F.col("hits_de") >= F.col("hits_es"), "de")
        .otherwise("es")
    )
    cells = (
        hits.select("actual_lang", guess.alias("guess"))
        .groupBy("actual_lang", "guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    margins = cells.groupBy("actual_lang").agg(
        F.sum("n").cast("long").alias("n_actual")
    )
    return (
        cells.join(F.broadcast(margins), "actual_lang")
        .select(
            "actual_lang",
            "guess",
            "n",
            pround(F.col("n").cast("double") / F.col("n_actual").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("actual_lang", "guess")
    )


# ---------------------------------------------------------------------------
# Top-10 word trigrams per language — the per-group top-k at corpus
# scale: one map-combinable (lang, ngram) count shuffle, then the rank
# window runs over the AGGREGATED ngram table partitioned by lang —
# never over raw token streams. Ties break lexicographically so the
# cut is deterministic.
# ---------------------------------------------------------------------------


@query(
    "top_ngrams_per_lang",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL}),
grams AS (
  SELECT lang, unnest({sql_word_shingles("toks", 3)}) AS ngram FROM base
), counts AS (
  SELECT lang, ngram, CAST(count(*) AS BIGINT) AS n
  FROM grams GROUP BY lang, ngram
), ranked AS (
  SELECT lang, ngram, n,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, ngram) AS BIGINT)
           AS rk
  FROM counts
)
SELECT lang, rk, ngram, n FROM ranked WHERE rk <= 10
ORDER BY lang, rk
""",
)
def top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    counts = (
        base.select("lang", F.explode(word_shingles("toks", 3)).alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("ngram"))
    return (
        counts.select(
            "lang", F.row_number().over(w).cast("long").alias("rk"), "ngram", "n"
        )
        .filter(F.col("rk") <= 10)
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility per language — tokens-per-100-chars and
# chars-per-token: the first number checked when a tokenizer meets a
# new language mix (high fertility = expensive languages dominate the
# token budget). Exact integer sums per language; one map-combinable
# shuffle.
# ---------------------------------------------------------------------------


@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
WITH base AS ({_DOC_BASE_SQL})
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(len(toks)) AS BIGINT) AS n_toks,
       {R("(100.0 * CAST(sum(len(toks)) AS DOUBLE) / CAST(sum(length(text)) AS DOUBLE))", 4)}
         AS toks_per_100_chars,
       {R("(CAST(sum(length(text)) AS DOUBLE) / CAST(sum(len(toks)) AS DOUBLE))", 4)}
         AS chars_per_tok
FROM base
GROUP BY lang
ORDER BY lang
""",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_base(spark, sf_dir)
    nc = F.sum(F.length("text")).cast("long")
    nt = F.sum(F.size("toks")).cast("long")
    return (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            nc.alias("n_chars"),
            nt.alias("n_toks"),
            pround(F.lit(100.0) * nt.cast("double") / nc.cast("double"), 4).alias(
                "toks_per_100_chars"
            ),
            pround(nc.cast("double") / nt.cast("double"), 4).alias("chars_per_tok"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Document-length power-law census per source: power-of-2 length bins
# (bit length of n_chars — integer-exact, no log2) — the shape check
# that catches truncated scrapes (missing tail) and boilerplate floods
# (spiked head) before training data ships.
# ---------------------------------------------------------------------------


@query(
    "doc_length_powerlaw_by_source",
    oracle=f"""
SELECT source,
       CAST(length(bin(n_chars)) AS BIGINT) AS len_bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
WHERE n_chars > 0
GROUP BY source, len_bin
ORDER BY source, len_bin
""",
)
def doc_length_powerlaw_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        docs.groupBy(
            "source", F.length(F.bin("n_chars")).cast("long").alias("len_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("source", "len_bin")
    )
