"""Diversified retrieval: Maximal Marginal Relevance (MMR) re-ranking
over the brute-force candidate pool — the dedup-aware top-k a RAG /
training-data retrieval stack serves (don't return 5 near-copies).

score(c) = 0.7·rel(q,c) − 0.3·max_{s∈S} sim(c,s), greedily for 5
steps over a 12-candidate pool per query.

Spark-first shape: candidate generation is the knn broadcast join +
bounded per-query window; the candidate×candidate sim matrix is a
per-query self-join (12×11 rows/query — bounded, never corpus
pairwise). The greedy selection is inherently sequential, so each of
the 5 steps runs as a distributed argmax over the bounded candidate
frame, with ONLY the chosen (query, winner) ids collected per step —
O(k·n_queries) driver state, the k-means precedent.

Cross-engine exactness: rel and sim are 6-dp-rounded cosines from
int64 fixed-point dots (identical doubles both engines); scores are
rounded before the argmax so selection order, ties included
(broken by smallest cid), is engine-exact. The DuckDB oracle unrolls
the SAME five steps as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..functions.vectors import cosine, sql_cosine
from ..registry import query

_N_QUERIES = 5
_POOL = 12
_K_SEL = 5


def _mmr_oracle() -> str:
    parts = [
        f"""
WITH cand0 AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         {R(sql_cosine("q.embedding", "c.embedding"), 6)} AS rel,
         c.embedding AS ce
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {_N_QUERIES}
), cand AS (
  SELECT qid, cid, rel, ce FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rk
    FROM cand0)
  WHERE rk <= {_POOL}
), pairs AS (
  SELECT a.qid, a.cid AS ca, b.cid AS cb,
         {R(sql_cosine("a.ce", "b.ce"), 6)} AS sim
  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
), sel1 AS (
  SELECT qid, cid, rel, score, CAST(1 AS BIGINT) AS step FROM (
    SELECT qid, cid, rel, {R("0.7 * rel - 0.3 * 0.0", 6)} AS score,
           row_number() OVER (PARTITION BY qid
             ORDER BY {R("0.7 * rel - 0.3 * 0.0", 6)} DESC, cid) AS rk
    FROM cand)
  WHERE rk = 1
), selc1 AS (SELECT qid, cid FROM sel1)"""
    ]
    for k in range(2, _K_SEL + 1):
        parts.append(
            f""", div{k} AS (
  SELECT p.qid, p.ca AS cid, max(p.sim) AS dv
  FROM pairs p JOIN selc{k - 1} s ON p.qid = s.qid AND p.cb = s.cid
  GROUP BY p.qid, p.ca
), sc{k} AS (
  SELECT c.qid, c.cid, c.rel, {R("0.7 * c.rel - 0.3 * d.dv", 6)} AS score
  FROM cand c JOIN div{k} d ON c.qid = d.qid AND c.cid = d.cid
  WHERE NOT EXISTS (SELECT 1 FROM selc{k - 1} s
                    WHERE s.qid = c.qid AND s.cid = c.cid)
), sel{k} AS (
  SELECT qid, cid, rel, score, CAST({k} AS BIGINT) AS step FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rk
    FROM sc{k})
  WHERE rk = 1
), selc{k} AS (SELECT qid, cid FROM selc{k - 1} UNION ALL SELECT qid, cid FROM sel{k})"""
        )
    union = " UNION ALL ".join(
        f"SELECT qid, step, cid, rel, score FROM sel{k}" for k in range(1, _K_SEL + 1)
    )
    parts.append(f"\nSELECT * FROM ({union}) ORDER BY qid, step")
    return "".join(parts)


@query("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    wrk = W.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    cand = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            pround(cosine("qe", "embedding"), 6).alias("rel"),
            F.col("embedding").alias("ce"),
        )
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _POOL)
        .drop("rk")
        .cache()
    )
    a = cand.select("qid", F.col("cid").alias("ca"), F.col("ce").alias("ae"))
    b = cand.select(
        F.col("qid").alias("qid_b"), F.col("cid").alias("cb"), F.col("ce").alias("be")
    )
    pairs = (
        a.join(b, (F.col("qid") == F.col("qid_b")) & (F.col("ca") != F.col("cb")))
        .select("qid", "ca", "cb", pround(cosine("ae", "be"), 6).alias("sim"))
        .cache()
    )

    wsel = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    step1 = (
        cand.select(
            "qid",
            "cid",
            "rel",
            pround(F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.lit(0.0), 6).alias(
                "score"
            ),
        )
        .withColumn("rk", F.row_number().over(wsel))
        .filter(F.col("rk") == 1)
        .select("qid", "cid", "rel", "score")
    )
    out = [
        (int(r["qid"]), 1, int(r["cid"]), float(r["rel"]), float(r["score"]))
        for r in step1.collect()
    ]
    selected = [(r[0], r[2]) for r in out]
    for step in range(2, _K_SEL + 1):
        sel_df = spark.createDataFrame(selected, "sqid long, scid long")
        div = (
            pairs.join(
                F.broadcast(sel_df),
                (F.col("qid") == F.col("sqid")) & (F.col("cb") == F.col("scid")),
            )
            .groupBy("qid", "ca")
            .agg(F.max("sim").alias("dv"))
            .select("qid", F.col("ca").alias("cid"), "dv")
        )
        rem = cand.join(
            F.broadcast(sel_df),
            (F.col("qid") == F.col("sqid")) & (F.col("cid") == F.col("scid")),
            "left_anti",
        )
        winners = (
            rem.join(div, ["qid", "cid"])
            .select(
                "qid",
                "cid",
                "rel",
                pround(F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("dv"), 6).alias(
                    "score"
                ),
            )
            .withColumn("rk", F.row_number().over(wsel))
            .filter(F.col("rk") == 1)
            .select("qid", "cid", "rel", "score")
            .collect()
        )
        for r in winners:
            out.append(
                (int(r["qid"]), step, int(r["cid"]), float(r["rel"]), float(r["score"]))
            )
            selected.append((int(r["qid"]), int(r["cid"])))
    return spark.createDataFrame(
        sorted(out), "qid long, step long, cid long, rel double, score double"
    )


# ---------------------------------------------------------------------------
# kNN label-consistency audit: for a bounded eval set (vec_id < 100),
# predict each vector's label as the majority among its 5 nearest
# neighbors (cosine, self excluded) and score accuracy per true
# label — the embedding-space QA that catches label noise a centroid
# test misses. The eval set is an ABSOLUTE bound, so the broadcast
# join stays |eval| x n (linear in corpus) at any scale; majority with
# deterministic tie-break = max(struct(votes, -label)).
# ---------------------------------------------------------------------------

_EVAL_N = 100
_KNN_K = 5


@query(
    "knn_label_eval",
    oracle=f"""
WITH ev AS (
  SELECT vec_id AS qid, embedding AS qe, CAST(label AS BIGINT) AS true_label
  FROM embeddings WHERE vec_id < {_EVAL_N}
), scored AS (
  SELECT e.qid, e.true_label, CAST(c.label AS BIGINT) AS nlabel,
         row_number() OVER (
           PARTITION BY e.qid
           ORDER BY {R(sql_cosine("e.qe", "c.embedding"), 6)} DESC, c.vec_id) AS rk
  FROM ev e JOIN embeddings c ON c.vec_id <> e.qid
), votes AS (
  SELECT qid, true_label, nlabel, CAST(count(*) AS BIGINT) AS v
  FROM scored WHERE rk <= {_KNN_K}
  GROUP BY qid, true_label, nlabel
), pred AS (
  SELECT qid, true_label,
         CAST(-struct_extract(max(struct_pack(v := v, nl := -nlabel)), 'nl') AS BIGINT)
           AS pred_label
  FROM votes GROUP BY qid, true_label
)
SELECT true_label,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       {R("CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS DOUBLE)"
          " / CAST(count(*) AS DOUBLE)", 4)} AS accuracy
FROM pred
GROUP BY true_label
ORDER BY true_label
""",
)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot_fixed, with_pair_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    # precompute each side's self-dot ONCE (per row, not per pair) —
    # the pairwise cosine then needs a single dot product instead of
    # three; the expression below reproduces cosine()'s exact double
    # ops from the same fixed-point integers, so results are
    # bit-identical to the naive form (and to the oracle).
    ev = emb.filter(F.col("vec_id") < _EVAL_N).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").cast("long").alias("true_label"),
        dot_fixed("embedding", "embedding").alias("qnorm"),
    )
    nb = emb.select(
        "vec_id",
        "embedding",
        F.col("label").cast("long").alias("nlabel"),
        dot_fixed("embedding", "embedding").alias("nnorm"),
    )
    # r11 continuation: the pairwise cosine rides with_pair_cosine like
    # the rest of the pair-cosine family — pround embedded the cross-
    # dot fold 3-4x per (query, neighbor) pair in the old inline form;
    # the fold columns are materialized once per pair, bit-identical.
    wrk = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    joined = (
        nb.join(F.broadcast(ev), F.col("vec_id") != F.col("qid"))
        .withColumn("daa", F.col("qnorm") / F.lit(1e9))
        .withColumn("dbb", F.col("nnorm") / F.lit(1e9))
    )
    scored = (
        with_pair_cosine(joined, "qe", "embedding", "cos", daa="daa", dbb="dbb")
        .select("qid", "true_label", "nlabel", "vec_id", "cos")
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _KNN_K)
    )
    votes = scored.groupBy("qid", "true_label", "nlabel").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    pred = votes.groupBy("qid", "true_label").agg(
        (-F.max(F.struct(F.col("v"), (-F.col("nlabel")).alias("nl")))["nl"])
        .cast("long")
        .alias("pred_label")
    )
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(hit).cast("long").alias("n_correct"),
            pround(
                F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("accuracy"),
        )
        .orderBy("true_label")
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson/Spärck Jones; k1=1.2, b=0.75) for a
# fixed 5-term query — the standard lexical search scorer (tfidf_top_
# terms summarizes documents; this RANKS them against a query).
# Portability: idf = ln((N−df+0.5)/(df+0.5)+1) is micro-quantized ONCE
# per term (5 bounded values — the DSIR ln-quantization argument), the
# tf-saturation factor tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl)) is micro-
# quantized per (doc,term), and the final score is pure integer
# arithmetic: Σ idf_micro·tf_micro div 10⁶. Scale: postings for the
# FIVE query terms only (filter before any join), df/avgdl are bounded
# broadcast aggregates, top-15 via ordered limit (TakeOrdered).
# ---------------------------------------------------------------------------
_BM25_TERMS = ("hash", "join", "vector", "stream", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in _BM25_TERMS)


@query(
    "doc_bm25_search",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
  FROM dl
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
  WHERE tok IN ({_bm25_terms_sql()})
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), idf AS (
  SELECT tok,
         CAST(floor(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                       / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0 + 0.5)
              AS BIGINT) AS idf_micro
  FROM df CROSS JOIN stats
), scored AS (
  SELECT tf.doc_id, tf.tok,
         CAST(floor(
           (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf.tf AS DOUBLE) + {_BM25_K1}
              * (1.0 - {_BM25_B} + {_BM25_B} * CAST(dl.dl AS DOUBLE)
                 * CAST(stats.n_docs AS DOUBLE) / CAST(stats.tot AS DOUBLE)))
           * 1000000.0 + 0.5) AS BIGINT) AS tf_micro
  FROM tf JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT s.doc_id,
       CAST(sum(i.idf_micro * s.tf_micro // 1000000) AS BIGINT) AS bm25_micro,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM scored s JOIN idf i ON i.tok = s.tok
GROUP BY s.doc_id
ORDER BY bm25_micro DESC, doc_id
LIMIT 15
""",
)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import norm_text

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text("text"), " ").alias("toks")
    )
    dl = base.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.floor(
            F.log(
                (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
                + 1.0
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("idf_micro"),
    )
    tf_sat = (
        F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + F.lit(_BM25_K1)
        * (
            F.lit(1.0)
            - F.lit(_BM25_B)
            + F.lit(_BM25_B)
            * F.col("dl").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("tot").cast("double")
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            F.floor(tf_sat * 1000000.0 + 0.5).cast("long").alias("tf_micro"),
        )
    )
    return (
        scored.join(F.broadcast(idf), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("idf_micro * tf_micro div 1000000"))
            .cast("long")
            .alias("bm25_micro"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(15)
    )
