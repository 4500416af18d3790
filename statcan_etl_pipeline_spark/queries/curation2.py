"""Corpus-curation round 2: cross-document repeated-chunk scan (the
chunk-granular "exact substring dedup" of an LLM training pipeline)
and per-dimension embedding calibration stats (the input to scalar
quantization / clipping decisions).

Scale notes (100 TB): chunking is a linear explode (no pairwise work);
chunk frequencies are a two-stage exact-distinct aggregate on the
16-byte fingerprint; the join back to occurrences is an equi-join on
the same key. Dimension stats shuffle only (dim → 64 keys) after
map-side partial aggregation; all moment sums are exact fixed-point
integers so cross-engine doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..functions.text import norm_text, sql_norm_text
from ..registry import query

_DEC = "decimal(38,0)"
_CHUNK = 8  # tokens per non-overlapping chunk


# ---------------------------------------------------------------------------
# Cross-document repeated-chunk scan: split each document into
# non-overlapping 8-token chunks, fingerprint each chunk (md5), count
# distinct documents per fingerprint, and report each document's
# duplicated-chunk fraction — the chunk-level exact-dedup signal used
# to strip boilerplate/mirrored spans before training. Linear in
# corpus size: explode → groupBy(fp) → join(fp); never compares texts
# pairwise.
# ---------------------------------------------------------------------------


@query(
    "interdoc_chunk_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {sql_norm_text("text")} AS norm FROM documents
), tk AS (
  SELECT doc_id, string_split(norm, ' ') AS toks FROM base
), ch AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(toks[(i * {_CHUNK} + 1):(i * {_CHUNK} + {_CHUNK})], ' ')) AS fp
  FROM tk, unnest(range(0, len(toks) // {_CHUNK})) AS t(i)
  WHERE len(toks) >= {_CHUNK}
), freq AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM ch GROUP BY fp
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       {R("CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS dup_ratio
FROM ch c JOIN freq f USING (fp)
GROUP BY c.doc_id
""",
)
def interdoc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("norm")
    )
    tk = docs.select("doc_id", F.split("norm", " ").alias("toks")).filter(
        F.size("toks") >= _CHUNK
    )
    ch = tk.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.size("toks") / _CHUNK).cast("long") - 1),
                lambda i: F.struct(
                    i.alias("chunk_idx"),
                    F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("toks"), i * _CHUNK + 1, _CHUNK)
                        ).cast("binary")
                    ).alias("fp"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.fp").alias("fp"))
    freq = ch.groupBy("fp").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    dup = F.when(F.col("df") > 1, 1).otherwise(0)
    return (
        ch.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            pround(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double"),
                4,
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding calibration stats (n, mean, std, min, max
# per coordinate) — what a scalar-quantizer or clipping pass reads
# first. Values are quantized to 1e-9 fixed point per element (the
# vectors.py convention) so Σq and Σq² are exact integers; mean and
# population std are single double divisions at the end.
# ---------------------------------------------------------------------------

_Q = (
    "CASE WHEN x >= 0 THEN CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT) "
    "ELSE -CAST(floor((-x) * 1000000000.0 + 0.5) AS BIGINT) END"
)


@query(
    "embedding_dim_stats",
    oracle=f"""
WITH ex AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), q AS (
  SELECT dim, x, {_Q} AS qx FROM ex
), g AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(qx AS HUGEINT)) AS HUGEINT) AS sq,
         CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT) AS sq2,
         min(x) AS mn, max(x) AS mx
  FROM q GROUP BY dim
)
SELECT dim, n,
       {R("CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)", 6)} AS mean,
       {R("sqrt(CAST(n * sq2 - sq * sq AS DOUBLE)) / (CAST(n AS DOUBLE) * 1000000000.0)", 6)} AS std,
       {R("mn", 6)} AS vmin,
       {R("mx", 6)} AS vmax
FROM g
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        F.col("dim").cast("long").alias("dim"), F.col("xf").cast("double").alias("x")
    )
    x = F.col("x")
    qx = (
        F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
        .otherwise(-F.floor((-x) * F.lit(1e9) + F.lit(0.5)))
        .cast("long")
    )
    g = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(qx.cast(_DEC)).alias("sq"),
        F.sum((qx * qx).cast(_DEC)).alias("sq2"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    n_d = F.col("n").cast("double")
    return g.select(
        "dim",
        "n",
        pround(F.col("sq").cast("double") / (n_d * F.lit(1e9)), 6).alias("mean"),
        pround(
            F.sqrt(
                (F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq")).cast("double")
            )
            / (n_d * F.lit(1e9)),
            6,
        ).alias("std"),
        pround(F.col("mn"), 6).alias("vmin"),
        pround(F.col("mx"), 6).alias("vmax"),
    )


# ---------------------------------------------------------------------------
# BPE merge discovery (first 3 merges), computed distributively — the
# tokenizer-training primitive. BPE iterates on the WORD-FREQUENCY
# table, not the corpus: vocab rows are (word, count, spelled-out
# symbol string), pair frequencies are a weighted bigram explode over
# the bounded vocabulary, the winning pair is an ordered LIMIT 1
# (TakeOrdered with a lexical tie-break), and the merge itself is a
# space-delimited string replace (left-to-right non-overlapping in
# both engines — the greedy-left BPE convention). Three fixed
# iterations chained lazily; the winner is broadcast into the next
# pass, so nothing but the 1-row argmax ever leaves the executors.
# ---------------------------------------------------------------------------


def _bpe_oracle(iters: int = 3) -> str:
    spell = (
        "array_to_string(list_transform(range(1, length(word) + 1), "
        "i -> substr(word, CAST(i AS BIGINT), 1)), ' ')"
    )
    parts = [
        f"""
WITH vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split({sql_norm_text("text")}, ' ')) AS word
        FROM documents)
  WHERE length(word) >= 1
  GROUP BY word
), v0 AS (
  SELECT word, wc, {spell} AS s FROM vocab
)"""
    ]
    prev = "v0"
    for k in range(1, iters + 1):
        parts.append(
            f""", pc{k} AS (
  SELECT ss[i] || ' ' || ss[i + 1] AS p, CAST(sum(wc) AS BIGINT) AS c
  FROM (SELECT string_split(s, ' ') AS ss, wc FROM {prev}
        WHERE len(string_split(s, ' ')) >= 2),
       unnest(range(1, len(ss))) AS t(i)
  GROUP BY p
), t{k} AS (
  SELECT p, c FROM pc{k} ORDER BY c DESC, p LIMIT 1
), v{k} AS (
  SELECT v.word, v.wc,
         trim(replace(' ' || v.s || ' ', ' ' || t.p || ' ',
                      ' ' || replace(t.p, ' ', '') || ' ')) AS s
  FROM {prev} v, t{k} t
)"""
        )
        prev = f"v{k}"
    union = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, p AS pair, "
        f"replace(p, ' ', '') AS merged, c AS pair_count FROM t{k}"
        for k in range(1, iters + 1)
    )
    parts.append(f"\nSELECT * FROM ({union}) ORDER BY step")
    return "".join(parts)


@query("corpus_bpe_merges", oracle=_bpe_oracle())
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        norm_text("text").alias("norm")
    )
    vocab = (
        docs.select(F.explode(F.split("norm", " ")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    v = vocab.withColumn(
        "s",
        F.expr(
            "array_join(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), ' ')"
        ),
    ).select("word", "wc", "s")

    tops = []
    for k in range(1, 4):
        ss = F.split("s", " ")
        pairs = (
            v.filter(F.size(ss) >= 2)
            .select(
                F.col("wc"),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(s, ' ')) - 1), "
                        "i -> concat(element_at(split(s, ' '), i), ' ', "
                        "element_at(split(s, ' '), i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").cast("long").alias("c"))
        )
        top1 = pairs.orderBy(F.desc("c"), F.asc("p")).limit(1)
        tops.append(
            top1.select(
                F.lit(k).cast("long").alias("step"),
                F.col("p").alias("pair"),
                F.replace(F.col("p"), F.lit(" "), F.lit("")).alias("merged"),
                F.col("c").alias("pair_count"),
            )
        )
        v = v.crossJoin(F.broadcast(top1)).select(
            "word",
            "wc",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("p"), F.lit(" ")),
                    F.concat(
                        F.lit(" "),
                        F.replace(F.col("p"), F.lit(" "), F.lit("")),
                        F.lit(" "),
                    ),
                )
            ).alias("s"),
        )
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out.orderBy("step")


# ---------------------------------------------------------------------------
# Feature-hashing document vectors (the hashing trick): each token is
# mapped to one of 64 dimensions (md5-derived index) with an
# md5-derived ±1 sign, giving a model-free 64-dim bag-of-words
# embedding — the featurization step of a model-less similarity /
# clustering pipeline, reproducible on any engine (no RNG, no
# vocabulary broadcast). The per-doc summary (nnz, exact-integer L1
# norm, argmax dimension with deterministic tie-break) is emitted
# instead of the raw vector so every column stays hash-comparable.
# Linear: explode tokens → per-(doc, dim) signed counts → per-doc agg.
# ---------------------------------------------------------------------------

_FH_DIM = 64


@query(
    "doc_feature_hash_embedding",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({sql_norm_text("text")}, ' ')) AS t
  FROM documents
), feat AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(t), 1, 2) AS INTEGER) % {_FH_DIM} AS BIGINT)
           AS dim,
         CASE WHEN substr(md5(t), 3, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS sgn
  FROM toks
), vec AS (
  SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS v
  FROM feat GROUP BY doc_id, dim
)
SELECT doc_id,
       CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
       CAST(sum(abs(v)) AS BIGINT) AS l1,
       CAST(-struct_extract(max(struct_pack(a := abs(v), nd := -dim)), 'nd')
            AS BIGINT) AS top_dim
FROM vec
GROUP BY doc_id
""",
)
def doc_feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(norm_text("text"), " ")).alias("t")
    )
    feat = docs.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("t")), 1, 2), 16, 10).cast("long")
            % _FH_DIM
        ).alias("dim"),
        F.when(
            F.substring(F.md5(F.col("t")), 3, 1).isin(*"01234567"), 1
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    vec = feat.groupBy("doc_id", "dim").agg(F.sum("sgn").cast("long").alias("v"))
    return vec.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") != 0, 1).otherwise(0)).cast("long").alias("nnz"),
        F.sum(F.abs("v")).cast("long").alias("l1"),
        (-F.max(F.struct(F.abs("v").alias("a"), (-F.col("dim")).alias("nd")))["nd"])
        .cast("long")
        .alias("top_dim"),
    )
