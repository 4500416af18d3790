"""Training-data curation batch 4: DSIR-style importance weighting,
exact shingle containment (subset-duplication detection), event-type
trigram mining, daily bounce rate, and reciprocal-rank-fusion quality
ranking.

Cross-engine exactness: every score that feeds a hash comparison is
either an exact integer (micro-quantized per ROW before any sum, so
accumulation order cannot matter) or a fixed sequence of IEEE double
ops on identical inputs. The one math-library call (`ln` in the DSIR
log-ratio) is quantized to 1e-6 per BUCKET (256 values, each a single
ln of a generic ratio — no systematic alignment with the quantization
grid, unlike floor(log2(2^k)) which sits exactly ON the discontinuity;
a 1-ulp library divergence at 1e-16 relative cannot move a 1e-6
rounding except on a knife-edge that the bucket-count construction
never produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..functions.text import (
    STOPWORDS,
    norm_text,
    sql_norm_text,
    sql_tokens,
    sql_word_shingles,
    word_shingles,
)
from ..registry import query

_DEC2 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# DSIR-lite importance weights (Data Selection via Importance
# Resampling, Xie et al. 2023): hashed-unigram bag-of-words language
# models for a TARGET domain (lang = 'en') vs the RAW corpus, with
# add-one smoothing over 256 md5 buckets. Each bucket's log-ratio is
# ONE ln call micro-quantized to an integer; a document's importance
# weight is then the EXACT integer Σ count_doc(b) · lr_micro(b).
# Reported per source: docs, mean weight, share of positive weights.
# Scale: token explode → two bounded (≤256-row) bucket aggregates
# broadcast back — the per-doc weighting is a map-side join.
# ---------------------------------------------------------------------------
_DSIR_B = 256


@query(
    "doc_dsir_importance_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, lang,
         CAST(CAST('0x' || substr(md5(unnest(string_split({sql_norm_text("text")}, ' '))), 1, 2)
              AS INTEGER) % {_DSIR_B} AS BIGINT) AS b
  FROM documents
), raw AS (
  SELECT b, CAST(count(*) AS BIGINT) AS cr FROM toks GROUP BY b
), tgt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS ct FROM toks WHERE lang = 'en' GROUP BY b
), tots AS (
  SELECT CAST(sum(cr) AS BIGINT) AS r_tot,
         (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS t_tot
  FROM raw
), lr AS (
  SELECT raw.b,
         {sql_cents(
             f"ln((CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(t_tot + {_DSIR_B} AS DOUBLE))"
             f" * (CAST(r_tot + {_DSIR_B} AS DOUBLE) / CAST(cr + 1 AS DOUBLE)))",
             6,
         )} AS lr_micro
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots
), docw AS (
  SELECT t.doc_id, t.source,
         CAST(sum(lr_micro) AS BIGINT) AS w_micro
  FROM toks t JOIN lr ON t.b = lr.b
  GROUP BY t.doc_id, t.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {R("CAST(sum(w_micro) AS DOUBLE) / count(*) / 1000000.0", 4)} AS mean_weight,
       {R("CAST(sum(CASE WHEN w_micro > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 4)} AS pos_share
FROM docw
GROUP BY source
ORDER BY source
""",
)
def doc_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(norm_text("text"), " ")).alias("t"),
    ).select(
        "doc_id",
        "source",
        "lang",
        (F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("long") % _DSIR_B).alias(
            "b"
        ),
    )
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    tots = raw.agg(F.sum("cr").cast("long").alias("r_tot")).crossJoin(
        tgt.agg(F.sum("ct").cast("long").alias("t_tot"))
    )
    ratio = (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
        / (F.col("t_tot") + _DSIR_B).cast("double")
    ) * (
        (F.col("r_tot") + _DSIR_B).cast("double")
        / (F.col("cr") + 1).cast("double")
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select("b", cents(F.log(ratio), 6).cast("long").alias("lr_micro"))
    )
    docw = (
        toks.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr_micro").cast("long").alias("w_micro"))
    )
    return (
        docw.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(
                F.sum("w_micro").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                4,
            ).alias("mean_weight"),
            pround(
                F.sum(F.when(F.col("w_micro") > 0, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pos_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact shingle CONTAINMENT — the asymmetric near-dup measure that
# catches subset duplication (doc A pasted inside doc B), which
# symmetric Jaccard under-scores: C = |A∩B| / min(|A|,|B|). Candidate
# pairs come from sharing a non-stop shingle (document frequency ≤ 50
# — the stop-shingle filter is what keeps the self-join from exploding
# on boilerplate at scale); the score is the exact integer
# inter·10⁶ div min(|A|,|B|).
# ---------------------------------------------------------------------------
@query(
    "doc_shingle_containment",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {sql_tokens(sql_norm_text("text"))} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest({sql_word_shingles("toks", 3)}) AS s FROM base
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
), keep AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 50
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM sh a JOIN keep USING (s) JOIN sh b USING (s)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), scored AS (
  SELECT doc_a, doc_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
         (inter * 1000000) // least(sa.sz, sb.sz) AS c_micro
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, inter, sz_a, sz_b,
       {R("CAST(c_micro AS DOUBLE) / 1000000.0", 6)} AS containment
FROM scored
WHERE c_micro >= 300000
ORDER BY doc_a, doc_b
""",
)
def doc_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text("text"), " ").alias("toks")
    )
    sh = docs.select(
        "doc_id", F.explode(word_shingles("toks", 3)).alias("s")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    keep = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= 50
    ).select("s")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(keep, "s")
        .join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    scored = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "c_micro",
            F.expr("(inter * 1000000) div least(sz_a, sz_b)"),
        )
    )
    return (
        scored.filter(F.col("c_micro") >= 300000)
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "sz_a",
            "sz_b",
            pround(F.col("c_micro").cast("double") / F.lit(1000000.0), 6).alias(
                "containment"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Event-type trigram mining: the 25 most frequent length-3 behavioural
# patterns across per-user event sequences (ordered by ts with
# event_id tie-break). Pure window lead() — no explode, no self-join;
# at scale the window keys on user_id so it shuffles once.
# ---------------------------------------------------------------------------
@query(
    "event_type_trigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY trigram
ORDER BY n DESC, trigram
LIMIT 25
""",
)
def event_type_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Daily bounce rate: share of 30-minute-gap sessions containing a
# single event, bucketed by session start date. Same sessionization
# construction as sessionize_events (lag + cumulative-flag windows);
# the rate is an exact count ratio.
# ---------------------------------------------------------------------------
@query(
    "events_bounce_rate_daily",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         strftime(min(ts), '%Y-%m-%d') AS day
  FROM sessions GROUP BY user_id, session_id
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       {R("CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS bounce_rate
FROM per_session
GROUP BY day
ORDER BY day
""",
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak=["event_id"])
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
    )
    return (
        per.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounce"),
            pround(
                F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of three document quality signals — the
# standard way to combine heterogeneous rankers without score
# calibration. Every signal is an exact INTEGER sort key (length;
# type-token ratio and mean word length in micro units via integer
# division), ranks come from row_number with doc_id tie-break, and the
# RRF score Σ 10⁹ div (60 + rank) stays an exact integer.
#
# Scale (r9): each global rank is a TWO-PASS range-banded rank, not a
# single-partition window — 256 equal-width integer bands off a 1-row
# broadcast min/max aggregate (band monotone DESC in the metric, so
# equal values share a band), row_number within band (bounded
# partitions), plus an exclusive prefix-sum offset over the ≤256-row
# band census (broadcast back). Exact same ranks as the global sort —
# the r9 registry-wide plan audit found this query was the only one
# still single-partitioning a raw fact scan under a window. The DuckDB
# oracle keeps the plain row_number formulation: single-node, and
# mathematically identical.
# ---------------------------------------------------------------------------
@query(
    "doc_rrf_quality_fusion",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, n_chars,
         len({sql_tokens(sql_norm_text("text"))}) AS n_toks,
         len(list_distinct({sql_tokens(sql_norm_text("text"))})) AS n_dist
  FROM documents
), keys AS (
  SELECT doc_id, n_chars,
         (n_dist * 1000000) // n_toks AS ttr_micro,
         ((n_chars - n_toks + 1) * 1000000) // n_toks AS mwl_micro
  FROM feats WHERE n_toks > 0
), ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
         row_number() OVER (ORDER BY ttr_micro DESC, doc_id) AS r2,
         row_number() OVER (ORDER BY mwl_micro DESC, doc_id) AS r3
  FROM keys
)
SELECT doc_id,
       CAST(1000000000 // (60 + r1)
          + 1000000000 // (60 + r2)
          + 1000000000 // (60 + r3) AS BIGINT) AS rrf_score,
       CAST(r1 AS BIGINT) AS rank_length,
       CAST(r2 AS BIGINT) AS rank_ttr,
       CAST(r3 AS BIGINT) AS rank_mwl
FROM ranked
ORDER BY rrf_score DESC, doc_id
LIMIT 25
""",
)
def doc_rrf_quality_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.split(norm_text("text"), " ").alias("toks")
    )
    feats = docs.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_dist"),
    )
    keys = feats.filter(F.col("n_toks") > 0).select(
        "doc_id",
        "n_chars",
        F.expr("(n_dist * 1000000) div n_toks").alias("ttr_micro"),
        F.expr("((n_chars - n_toks + 1) * 1000000) div n_toks").alias("mwl_micro"),
    )
    from ..operators.ranks import two_pass_desc_ranks

    # exact global DESC ranks via the two-pass range-banded operator
    # (operators/ranks.py) — equal ranks to a global sort, every
    # window bounded; equivalence property-pinned in tests.
    ranked = two_pass_desc_ranks(
        keys,
        [("n_chars", "r1"), ("ttr_micro", "r2"), ("mwl_micro", "r3")],
        tie_col="doc_id",
    )
    return (
        ranked.select(
            "doc_id",
            F.expr(
                "1000000000 div (60 + r1) + 1000000000 div (60 + r2)"
                " + 1000000000 div (60 + r3)"
            )
            .cast("long")
            .alias("rrf_score"),
            F.col("r1").cast("long").alias("rank_length"),
            F.col("r2").cast("long").alias("rank_ttr"),
            F.col("r3").cast("long").alias("rank_mwl"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rapid Automatic Keyword Extraction, Rose et
# al. 2010): candidate phrases are maximal stopword-free token runs
# (delimited by the 20-word multilingual stopword list, phrase length
# ≤ 4); each word scores degree/frequency where degree sums the
# lengths of every phrase the word occurs in, and a phrase scores the
# sum of its words' scores. Every score is an exact integer
# (degree·10⁶ div frequency), so ranking is engine-exact. Scale:
# posexplode → two bounded groupBys + one broadcast join of the word
# score table; no pairwise joins anywhere.
# ---------------------------------------------------------------------------
_RAKE_STOPS = tuple(w for ws in STOPWORDS.values() for w in ws)


def _rake_stop_list() -> str:
    return ", ".join(f"'{w}'" for w in _RAKE_STOPS)


@query(
    "text_rake_keywords",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(t, 1) AS idx, unnest(t) AS tok
  FROM (SELECT doc_id, {sql_tokens(sql_norm_text("text"))} AS t FROM documents)
), flagged AS (
  SELECT doc_id, idx, tok,
         CASE WHEN tok IN ({_rake_stop_list()}) THEN 1 ELSE 0 END AS stop
  FROM toks
), pids AS (
  -- pid must be computed over ALL tokens (stopwords included) BEFORE
  -- dropping the stopword rows, or every run would collapse to pid 0
  SELECT doc_id, idx, tok, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
  FROM flagged
), runs AS (
  SELECT doc_id, idx, tok, pid FROM pids WHERE stop = 0
), phr AS (
  SELECT doc_id, pid, string_agg(tok, ' ' ORDER BY idx) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM runs GROUP BY doc_id, pid
  HAVING count(*) <= 4
), occ AS (
  SELECT r.tok, p.plen, p.doc_id, p.pid, p.phrase
  FROM runs r JOIN phr p ON r.doc_id = p.doc_id AND r.pid = p.pid
), wscore AS (
  SELECT tok, (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS s_micro
  FROM occ GROUP BY tok
), pscore AS (
  SELECT o.doc_id, o.pid, o.phrase,
         CAST(sum(w.s_micro) AS BIGINT) AS score_micro
  FROM occ o JOIN wscore w ON o.tok = w.tok
  GROUP BY o.doc_id, o.pid, o.phrase
)
SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(max(score_micro) AS BIGINT) AS score_micro
FROM pscore
GROUP BY phrase
ORDER BY score_micro DESC, phrase
LIMIT 25
""",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text("text"), " ").alias("t")
    )
    toks = docs.select(
        "doc_id", F.posexplode("t").alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).alias("idx"), "tok")
    flagged = toks.select(
        "doc_id",
        "idx",
        "tok",
        F.when(F.col("tok").isin(*_RAKE_STOPS), 1).otherwise(0).alias("stop"),
    )
    wrun = (
        W.partitionBy("doc_id")
        .orderBy("idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = flagged.select(
        "doc_id", "idx", "tok", "stop", F.sum("stop").over(wrun).alias("pid")
    ).filter(F.col("stop") == 0)
    phr = (
        runs.groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= 4)
    )
    occ = runs.join(phr, ["doc_id", "pid"]).select("tok", "plen", "doc_id", "pid", "phrase")
    wscore = occ.groupBy("tok").agg(
        F.expr("(CAST(sum(plen) AS BIGINT) * 1000000) div count(*)").alias("s_micro")
    )
    pscore = (
        occ.join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "pid", "phrase")
        .agg(F.sum("s_micro").cast("long").alias("score_micro"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.max("score_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "phrase")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
# document by its mean token negative-logprob under a hashed-unigram
# (256-bucket) corpus LM with add-one smoothing, then split the corpus
# into head / middle / tail quality terciles by the GLOBAL discrete
# tercile thresholds — the standard quality-gate before LLM training.
# Exactness: per-bucket −ln p is micro-quantized once (≤256 ln calls —
# the DSIR argument), each doc's score is the exact integer
# (Σ neglogp_micro · 1000) div n_tokens, and the tercile cuts are
# quantile_disc picks of those INTEGER scores (actual stored values —
# bit-exact). Scale: bounded LM broadcast, one explode, one groupBy.
# ---------------------------------------------------------------------------
@query(
    "doc_perplexity_buckets",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(CAST('0x' || substr(md5(unnest(string_split({sql_norm_text("text")}, ' '))), 1, 2)
              AS INTEGER) % {_DSIR_B} AS BIGINT) AS b
  FROM documents
), lm AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY b
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM lm
), nlp AS (
  SELECT b,
         CAST(floor(-ln(CAST(c + 1 AS DOUBLE) / CAST(t + {_DSIR_B} AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS nlp_micro
  FROM lm CROSS JOIN tot
), docsc AS (
  SELECT t.doc_id, t.source,
         (CAST(sum(n.nlp_micro) AS BIGINT) * 1000) // count(*) AS ce_nano
  FROM toks t JOIN nlp n ON n.b = t.b
  GROUP BY t.doc_id, t.source
), cuts AS (
  SELECT quantile_disc(ce_nano, 1.0/3.0) AS c1,
         quantile_disc(ce_nano, 2.0/3.0) AS c2
  FROM docsc
), bucketed AS (
  SELECT source,
         CASE WHEN ce_nano <= c1 THEN 'head'
              WHEN ce_nano <= c2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         ce_nano
  FROM docsc CROSS JOIN cuts
)
SELECT source, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       {R("CAST(sum(ce_nano) AS DOUBLE) / count(*) / 1e9", 4)} AS mean_neglogprob
FROM bucketed
GROUP BY source, bucket
ORDER BY source, bucket
""",
)
def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(norm_text("text"), " ")).alias("t"),
    ).select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("long") % _DSIR_B).alias(
            "b"
        ),
    )
    lm = toks.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = lm.agg(F.sum("c").cast("long").alias("t"))
    nlp = lm.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            -F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("t") + _DSIR_B).cast("double")
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("nlp_micro"),
    )
    docsc = (
        toks.join(F.broadcast(nlp), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.expr("(CAST(sum(nlp_micro) AS BIGINT) * 1000) div count(*)").alias(
                "ce_nano"
            )
        )
    )
    cuts = docsc.agg(
        F.expr(
            "percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY ce_nano)"
        ).alias("c1"),
        F.expr(
            "percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY ce_nano)"
        ).alias("c2"),
    )
    bucketed = docsc.crossJoin(F.broadcast(cuts)).select(
        "source",
        F.when(F.col("ce_nano") <= F.col("c1"), "head")
        .when(F.col("ce_nano") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "ce_nano",
    )
    return (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(
                F.sum("ce_nano").cast("double") / F.count(F.lit(1)) / F.lit(1e9), 4
            ).alias("mean_neglogprob"),
        )
        .orderBy("source", "bucket")
    )


# ---------------------------------------------------------------------------
# Temperature-based source sampling (the multilingual/multi-source
# mixing rule used for LLM training corpora): sampling weight
# p_s ∝ n_s^τ with τ = 0.7 flattens the source distribution so small
# sources are up-sampled. n^0.7 = exp(0.7·ln n) is micro-quantized
# ONCE per source (20 bounded values — the DSIR ln argument); shares
# and effective epochs (p_s·T/n_s — how many times each source repeats
# in one pass of the resampled corpus) are then fixed double
# sequences over exact integers. The Σ n^τ normalizer folds in
# source-sorted order (ANOVA precedent).
# ---------------------------------------------------------------------------
_TEMP_TAU = 0.7


@query(
    "corpus_temperature_sampling",
    oracle=f"""
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({sql_tokens(sql_norm_text("text"))})) AS BIGINT) AS n_toks
  FROM documents GROUP BY source
), pw AS (
  SELECT source, n_docs, n_toks,
         CAST(floor(exp({_TEMP_TAU} * ln(CAST(n_toks AS DOUBLE))) * 1000000.0 + 0.5)
              AS BIGINT) AS w_micro
  FROM src
), tot AS (
  SELECT CAST(sum(n_toks) AS BIGINT) AS t_toks,
         CAST(sum(w_micro) AS BIGINT) AS w_all
  FROM pw
)
SELECT source, n_docs, n_toks,
       {R("CAST(n_toks AS DOUBLE) / CAST(t_toks AS DOUBLE)", 6)} AS raw_share,
       {R("CAST(w_micro AS DOUBLE) / CAST(w_all AS DOUBLE)", 6)} AS temp_share,
       {R(
           "(CAST(w_micro AS DOUBLE) / CAST(w_all AS DOUBLE))"
           " * CAST(t_toks AS DOUBLE) / CAST(n_toks AS DOUBLE)",
           4,
       )} AS effective_epochs
FROM pw CROSS JOIN tot
ORDER BY source
""",
)
def corpus_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split(norm_text("text"), " ")).alias("ntok")
    )
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_toks"),
    )
    pw = src.select(
        "source",
        "n_docs",
        "n_toks",
        F.floor(
            F.exp(F.lit(_TEMP_TAU) * F.log(F.col("n_toks").cast("double")))
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("w_micro"),
    )
    tot = pw.agg(
        F.sum("n_toks").cast("long").alias("t_toks"),
        F.sum("w_micro").cast("long").alias("w_all"),
    )
    t_d = F.col("t_toks").cast("double")
    share = F.col("w_micro").cast("double") / F.col("w_all").cast("double")
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_toks",
            pround(F.col("n_toks").cast("double") / t_d, 6).alias("raw_share"),
            pround(share, 6).alias("temp_share"),
            pround(share * t_d / F.col("n_toks").cast("double"), 4).alias(
                "effective_epochs"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (Deng et al. 2013) — the experimentation-
# platform adjustment that uses each user's PRE-period activity as a
# control covariate: θ = cov(X,Y)/var(X) and the adjusted metric
# Y − θ(X − X̄) has variance var(Y)·(1 − ρ²). Pre = Jan 1–15, post =
# Jan 16–30; per-user totals are exact integer cents (absent period =
# 0 — users must not drop or the covariance is biased), all moments
# exact DECIMAL/HUGEINT, θ / ρ² a fixed scalar-double sequence.
# Scale: one user rollup, one 1-row moment aggregate.
# ---------------------------------------------------------------------------
_CUPED_SPLIT = "2024-01-16"


@query(
    "events_cuped_variance_reduction",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                  THEN {sql_cents("value")} ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                  THEN {sql_cents("value")} ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user
), fit AS (
  SELECT n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
  FROM mom
)
SELECT n AS n_users,
       {R("covn / varx", 6)} AS theta,
       {R("100.0 * covn * covn / (varx * vary)", 4)} AS var_reduction_pct
FROM fit
""",
)
def events_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    vc = cents("value")
    split = F.lit(_CUPED_SPLIT + " 00:00:00").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, vc).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= split, vc).otherwise(0)).cast("long").alias("y"),
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(_DEC2).alias("sx"),
        F.sum("y").cast(_DEC2).alias("sy"),
        F.sum(F.col("x").cast(_DEC2) * F.col("y").cast(_DEC2)).alias("sxy"),
        F.sum(F.col("x").cast(_DEC2) * F.col("x").cast(_DEC2)).alias("sxx"),
        F.sum(F.col("y").cast(_DEC2) * F.col("y").cast(_DEC2)).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    covn = n_d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    varx = n_d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary = n_d * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    return mom.select(
        F.col("n").alias("n_users"),
        pround(covn / varx, 6).alias("theta"),
        pround(F.lit(100.0) * covn * covn / (varx * vary), 4).alias(
            "var_reduction_pct"
        ),
    )