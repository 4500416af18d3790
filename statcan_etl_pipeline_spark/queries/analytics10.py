"""Round-7 analytics batch: data-profiling and reporting operators a
StatCan-style production pipeline runs constantly — an ANALYZE-style
column profiler, calendar traffic fingerprints, corpus charset/stopword
QA, price positioning, mix-shift decomposition, and an exact mode
profile. All exact integer / portable-rounded arithmetic, full oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import cents, pround, sql_cents, sql_round as R
from ..functions.text import norm_text, sql_norm_text, sql_tokens, tokens
from ..registry import query


# ---------------------------------------------------------------------------
# ANALYZE-style column profiler for `orders`: one scan computes
# null-count / exact distinct / min / max for every column, then a
# stack() unpivots the single aggregate row into one row per column.
# All reprs are canonical strings (longs, cents-longs, ISO dates) so
# both engines render identically. Scale: one pass + six count-distinct
# partials — exactly what a table-stats collector does before CBO; at
# 100 TB swap the exact distincts for HLL (approx_distinct_* pattern).
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    # (name, spark/duck repr expression template over {c})
    ("o_orderkey", "CAST({c} AS BIGINT)"),
    ("o_custkey", "CAST({c} AS BIGINT)"),
    ("o_orderstatus", "{c}"),
    ("o_totalprice", sql_cents("{c}")),
    ("o_orderdate", None),  # date — engine-specific rendering below
    ("o_orderpriority", "{c}"),
]


def _profile_oracle() -> str:
    branches = []
    for name, tmpl in _PROFILE_COLS:
        if tmpl is None:
            rep = f"strftime(min(o_orderdate), '%Y-%m-%d')", f"strftime(max(o_orderdate), '%Y-%m-%d')"
            mn, mx = rep
        else:
            e = tmpl.format(c=name)
            mn, mx = f"CAST(min({e}) AS VARCHAR)", f"CAST(max({e}) AS VARCHAR)"
        branches.append(
            f"SELECT '{name}' AS col_name,"
            f" CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_repr, {mx} AS max_repr FROM orders"
        )
    return " UNION ALL ".join(branches) + " ORDER BY col_name"


@query("orders_column_profile", oracle=_profile_oracle())
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for name, tmpl in _PROFILE_COLS:
        if tmpl is None:
            mn = F.date_format(F.min(name), "yyyy-MM-dd")
            mx = F.date_format(F.max(name), "yyyy-MM-dd")
        else:
            e = F.expr(tmpl.format(c=name))
            mn = F.min(e).cast("string")
            mx = F.max(e).cast("string")
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).cast("long").alias(f"nn_{name}"),
            F.count_distinct(F.col(name)).cast("long").alias(f"nd_{name}"),
            mn.alias(f"mn_{name}"),
            mx.alias(f"mx_{name}"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', nn_{name}, nd_{name}, mn_{name}, mx_{name}"
        for name, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Hour-of-week traffic fingerprint: events bucketed by (weekday, hour)
# with volume, distinct users, error counts and a portable share ratio.
# Weekday is Monday=0..6 in BOTH engines (Spark weekday(), DuckDB
# isodow()-1). One groupBy + a broadcast 1-row total — linear.
# ---------------------------------------------------------------------------
@query(
    "events_hour_of_week_profile",
    oracle=f"""
WITH b AS (
  SELECT CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
         CAST(hour(ts) AS BIGINT) AS hour_of_day,
         user_id, event_type
  FROM events
), g AS (
  SELECT weekday, hour_of_day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM b GROUP BY weekday, hour_of_day
)
SELECT weekday, hour_of_day, n_events, n_users, n_errors,
       {R("CAST(n_events AS DOUBLE) / CAST((SELECT count(*) FROM events) AS DOUBLE)", 6)}
         AS share
FROM g
ORDER BY weekday, hour_of_day
""",
)
def events_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.select(
            F.expr("weekday(ts)").cast("long").alias("weekday"),
            F.hour("ts").cast("long").alias("hour_of_day"),
            "user_id",
            "event_type",
        )
        .groupBy("weekday", "hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum((F.col("event_type") == "error").cast("long"))
            .cast("long")
            .alias("n_errors"),
        )
    )
    total = ev.agg(F.count(F.lit(1)).cast("double").alias("total"))
    return (
        g.join(F.broadcast(total))
        .select(
            "weekday",
            "hour_of_day",
            "n_events",
            "n_users",
            "n_errors",
            pround(F.col("n_events").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("weekday", "hour_of_day")
    )


# ---------------------------------------------------------------------------
# Charset-class corpus QA: per language, how much of the text is
# lowercase letters vs digits vs spaces vs "other"? The classic cheap
# garbage detector (mojibake / binary spill shows up as `other`).
# regexp_replace-based counting is identical in both engines; ratios
# are portable-rounded. Linear single pass.
# ---------------------------------------------------------------------------
@query(
    "doc_script_mix",
    oracle=f"""
WITH c AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_letters,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_letters) AS BIGINT) AS total_letters,
       CAST(sum(n_digits) AS BIGINT) AS total_digits,
       CAST(sum(n_spaces) AS BIGINT) AS total_spaces,
       CAST(sum(n_chars - n_letters - n_digits - n_spaces) AS BIGINT) AS total_other,
       {R("CAST(sum(n_letters) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)", 6)}
         AS letter_ratio
FROM c GROUP BY lang
ORDER BY lang
""",
)
def doc_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias(
            "n_letters"
        ),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias(
            "n_digits"
        ),
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")))
        .cast("long")
        .alias("n_spaces"),
    )
    return (
        c.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_letters").cast("long").alias("total_letters"),
            F.sum("n_digits").cast("long").alias("total_digits"),
            F.sum("n_spaces").cast("long").alias("total_spaces"),
            F.sum(
                F.col("n_chars")
                - F.col("n_letters")
                - F.col("n_digits")
                - F.col("n_spaces")
            )
            .cast("long")
            .alias("total_other"),
            pround(
                F.sum("n_letters").cast("double") / F.sum("n_chars").cast("double"),
                6,
            ).alias("letter_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Stopword-profile per source: whitespace tokens vs a fixed function-
# word list, counted with array higher-order functions — no explode, no
# shuffle of a token stream; the filter runs inside the row. Shared
# list constant keeps both engines literally identical.
# ---------------------------------------------------------------------------
_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with", "by", "at",
)
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


@query(
    "text_stopword_profile",
    oracle=f"""
WITH t AS (
  SELECT source,
         {sql_tokens(sql_norm_text("text"))} AS toks
  FROM documents
), c AS (
  SELECT source,
         CAST(len(toks) AS BIGINT) AS n_toks,
         CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS BIGINT) AS n_stop
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(n_stop) AS BIGINT) AS stopword_tokens,
       {R("CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_toks) AS DOUBLE)", 6)}
         AS stop_ratio
FROM c GROUP BY source
ORDER BY source
""",
)
def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", norm_text("text").alias("norm")
    )
    c = docs.select(
        "source",
        F.size(tokens("norm")).cast("long").alias("n_toks"),
        F.size(F.expr(f"filter(split(norm, ' '), x -> x IN {_STOP_SQL})"))
        .cast("long")
        .alias("n_stop"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("n_stop").cast("long").alias("stopword_tokens"),
            pround(
                F.sum("n_stop").cast("double") / F.sum("n_toks").cast("double"), 6
            ).alias("stop_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Weekday seasonality lift: events per weekday normalized by how many
# distinct calendar days of that weekday the data covers, vs the
# overall daily rate. The denominator discipline (per-weekday day
# counts, not 1/7 of the span) keeps partial weeks honest.
# ---------------------------------------------------------------------------
@query(
    "events_zseason_weekday_lift",
    oracle=f"""
WITH d AS (
  SELECT CAST(isodow(ts) - 1 AS BIGINT) AS weekday, CAST(ts AS DATE) AS day
  FROM events
), g AS (
  SELECT weekday,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT day) AS BIGINT) AS n_days
  FROM d GROUP BY weekday
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS all_events,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS all_days
  FROM events
)
SELECT weekday, n_events, n_days,
       {R("CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE)", 4)} AS events_per_day,
       {R("(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE))"
          " / (CAST(all_events AS DOUBLE) / CAST(all_days AS DOUBLE))", 6)} AS lift
FROM g CROSS JOIN tot
ORDER BY weekday
""",
)
def events_zseason_weekday_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.expr("weekday(ts)").cast("long").alias("weekday"),
        F.to_date("ts").alias("day"),
    )
    g = d.groupBy("weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("day").cast("long").alias("n_days"),
    )
    tot = ev.agg(
        F.count(F.lit(1)).cast("long").alias("all_events"),
        F.count_distinct(F.to_date("ts")).cast("long").alias("all_days"),
    )
    per_day = F.col("n_events").cast("double") / F.col("n_days").cast("double")
    overall = F.col("all_events").cast("double") / F.col("all_days").cast("double")
    return (
        g.join(F.broadcast(tot))
        .select(
            "weekday",
            "n_events",
            "n_days",
            pround(per_day, 4).alias("events_per_day"),
            pround(per_day / overall, 6).alias("lift"),
        )
        .orderBy("weekday")
    )


# ---------------------------------------------------------------------------
# Within-brand price ladder: every brand's price range plus its exact
# discrete median (order statistic on integer cents — no interpolation)
# and how many parts sit strictly above it. Windows partition by brand
# (bounded fan-out); the median never leaves the partition.
# ---------------------------------------------------------------------------
@query(
    "part_brand_price_ladder",
    oracle=f"""
WITH p AS (
  SELECT p_brand, p_partkey, {sql_cents("p_retailprice")} AS pc FROM part
), r AS (
  SELECT p_brand, pc,
         row_number() OVER (PARTITION BY p_brand ORDER BY pc, p_partkey) AS rn,
         count(*) OVER (PARTITION BY p_brand) AS n
  FROM p
), m AS (
  SELECT p_brand,
         max(CASE WHEN rn = (n + 1) // 2 THEN pc END) AS med_c
  FROM r GROUP BY p_brand
)
SELECT r.p_brand,
       CAST(max(r.n) AS BIGINT) AS n_parts,
       {R("CAST(min(r.pc) AS DOUBLE) / 100.0", 2)} AS min_price,
       {R("CAST(max(m.med_c) AS DOUBLE) / 100.0", 2)} AS median_price,
       {R("CAST(max(r.pc) AS DOUBLE) / 100.0", 2)} AS max_price,
       CAST(sum(CASE WHEN r.pc > m.med_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_median
FROM r JOIN m ON r.p_brand = m.p_brand
GROUP BY r.p_brand
ORDER BY r.p_brand
""",
)
def part_brand_price_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select("p_brand", "p_partkey", cents("p_retailprice").alias("pc"))
    wrank = W.partitionBy("p_brand").orderBy("pc", "p_partkey")
    wall = W.partitionBy("p_brand")
    r = p.select(
        "p_brand",
        "pc",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    med = (
        r.groupBy("p_brand")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("pc")
                )
            ).alias("med_c")
        )
    )
    return (
        r.join(F.broadcast(med), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.max("n").cast("long").alias("n_parts"),
            pround(F.min("pc").cast("double") / 100.0, 2).alias("min_price"),
            pround(F.max("med_c").cast("double") / 100.0, 2).alias("median_price"),
            pround(F.max("pc").cast("double") / 100.0, 2).alias("max_price"),
            F.sum((F.col("pc") > F.col("med_c")).cast("long"))
            .cast("long")
            .alias("n_above_median"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Priority mix-shift: each order priority's share of yearly volume and
# its percentage-point change vs the prior year — the standard "is the
# composition drifting?" decomposition. Counts are exact; shares are
# identical double formulas portable-rounded; lag runs over the tiny
# (year x priority) aggregate, never the fact table.
# ---------------------------------------------------------------------------
@query(
    "orders_priority_mix_shift",
    oracle=f"""
WITH g AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY yr, priority
), s AS (
  SELECT yr, priority, n,
         CAST(sum(n) OVER (PARTITION BY yr) AS BIGINT) AS yr_total
  FROM g
), sh AS (
  SELECT yr, priority, n, yr_total,
         CAST(n AS DOUBLE) / CAST(yr_total AS DOUBLE) AS share,
         lag(CAST(n AS DOUBLE) / CAST(yr_total AS DOUBLE)) OVER (
           PARTITION BY priority ORDER BY yr) AS prev_share
  FROM s
)
SELECT yr, priority, n, yr_total,
       {R("share * 100.0", 4)} AS share_pct,
       {R("(share - prev_share) * 100.0", 4)} AS pp_change
FROM sh
ORDER BY yr, priority
""",
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = (
        orders.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.col("o_orderpriority").alias("priority"),
        )
        .groupBy("yr", "priority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    s = g.withColumn(
        "yr_total", F.sum("n").over(W.partitionBy("yr")).cast("long")
    )
    share = F.col("n").cast("double") / F.col("yr_total").cast("double")
    sh = s.withColumn("share", share).withColumn(
        "prev_share",
        F.lag("share").over(W.partitionBy("priority").orderBy("yr")),
    )
    return sh.select(
        "yr",
        "priority",
        "n",
        "yr_total",
        pround(F.col("share") * 100.0, 4).alias("share_pct"),
        pround((F.col("share") - F.col("prev_share")) * 100.0, 4).alias("pp_change"),
    ).orderBy("yr", "priority")


# ---------------------------------------------------------------------------
# Exact mode profile: the most frequent quantity per return flag (min
# value wins ties — deterministic in both engines), its frequency, and
# the distinct-value count. Two bounded aggregations; the rank window
# runs over the (flag x quantity) aggregate, not the fact table.
# ---------------------------------------------------------------------------
@query(
    "lineitem_quantity_mode_profile",
    oracle=f"""
WITH g AS (
  SELECT l_returnflag, {sql_cents("l_quantity")} AS qc,
         CAST(count(*) AS BIGINT) AS freq
  FROM lineitem GROUP BY l_returnflag, qc
), r AS (
  SELECT l_returnflag, qc, freq,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY freq DESC, qc) AS rk,
         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS n_distinct_qty
  FROM g
)
SELECT l_returnflag,
       {R("CAST(qc AS DOUBLE) / 100.0", 2)} AS mode_quantity,
       freq AS mode_freq, n_distinct_qty
FROM r WHERE rk = 1
ORDER BY l_returnflag
""",
)
def lineitem_quantity_mode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select("l_returnflag", cents("l_quantity").alias("qc"))
        .groupBy("l_returnflag", "qc")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    r = g.select(
        "l_returnflag",
        "qc",
        "freq",
        F.row_number()
        .over(W.partitionBy("l_returnflag").orderBy(F.desc("freq"), "qc"))
        .alias("rk"),
        F.count(F.lit(1))
        .over(W.partitionBy("l_returnflag"))
        .cast("long")
        .alias("n_distinct_qty"),
    )
    return (
        r.filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            pround(F.col("qc").cast("double") / 100.0, 2).alias("mode_quantity"),
            F.col("freq").alias("mode_freq"),
            "n_distinct_qty",
        )
        .orderBy("l_returnflag")
    )
