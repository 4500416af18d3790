"""Round-6 analytics: OHLC resampling bars and contribution-to-growth
decomposition — two statistics-agency / market-data staples.

House rules: exact integer cents before division, pround/sql_round
twins, deterministic tie-breaks on (ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_cents, sql_round as R
from ..registry import query

# ---------------------------------------------------------------------------
# OHLC bars: resample the event stream to hourly open/high/low/close
# per event type — the canonical timeseries-downsample operator.
# Spark side: ONE aggregation with min_by/max_by over a (ts, event_id)
# struct key — map-side partial agg, no window, no second shuffle; the
# struct key makes first/last deterministic even under equal
# timestamps. The DuckDB oracle proves the same result via the
# row_number formulation (its min_by lacks composite keys).
# ---------------------------------------------------------------------------


@query(
    "events_ohlc_hourly",
    oracle="""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour_start,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM e
GROUP BY event_type, hour_start
ORDER BY event_type, hour_start
""",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_start"),
            "value",
            key.alias("k"),
        )
        .groupBy("event_type", "hour_start")
        .agg(
            F.expr("min_by(value, k)").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, k)").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("event_type", "hour_start")
    )


# ---------------------------------------------------------------------------
# Contribution to growth: decompose month-over-month total revenue
# growth into per-priority contributions — the StatCan/ONS release
# table ("GDP grew 0.3%; manufacturing contributed 0.2pp"). Exact
# integer cents throughout; the only windows are per-priority lag and
# a per-month total lag, both over the tiny month×priority aggregate
# (≤ 80 months × 5 priorities), never over the fact table. Property:
# per-month contributions sum to the total growth rate exactly in
# cents space.
# ---------------------------------------------------------------------------


@query(
    "revenue_contribution_growth",
    oracle=f"""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         o_orderpriority AS prio,
         CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS rev_c
  FROM orders GROUP BY month_start, prio
), tot AS (
  SELECT month_start AS tms, CAST(sum(rev_c) AS BIGINT) AS tot_c FROM m GROUP BY tms
), lagged AS (
  SELECT m.month_start, m.prio, m.rev_c,
         lag(m.rev_c) OVER (PARTITION BY m.prio ORDER BY m.month_start) AS prev_c,
         t.tot_c,
         lag(t.tot_c) OVER (PARTITION BY m.prio ORDER BY m.month_start) AS prev_tot_c
  FROM m JOIN tot t ON t.tms = m.month_start
)
SELECT month_start, prio, rev_c, prev_c,
       CASE WHEN prev_tot_c IS NULL OR prev_tot_c = 0 THEN NULL ELSE
       {R("(CAST(rev_c - prev_c AS DOUBLE) / CAST(prev_tot_c AS DOUBLE))", 8)}
       END AS contribution_pp
FROM lagged
ORDER BY month_start, prio
""",
)
def revenue_contribution_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import cents

    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.select(
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.col("o_orderpriority").alias("prio"),
            cents("o_totalprice").alias("c"),
        )
        .groupBy("month_start", "prio")
        .agg(F.sum("c").cast("long").alias("rev_c"))
    )
    tot = m.groupBy("month_start").agg(F.sum("rev_c").cast("long").alias("tot_c"))
    w = W.partitionBy("prio").orderBy("month_start")
    lagged = (
        m.join(F.broadcast(tot), "month_start")
        .withColumn("prev_c", F.lag("rev_c").over(w))
        .withColumn("prev_tot_c", F.lag("tot_c").over(w))
    )
    contrib = F.when(
        F.col("prev_tot_c").isNotNull() & (F.col("prev_tot_c") != 0),
        pround(
            (F.col("rev_c") - F.col("prev_c")).cast("double")
            / F.col("prev_tot_c").cast("double"),
            8,
        ),
    )
    return lagged.select(
        "month_start",
        "prio",
        "rev_c",
        "prev_c",
        contrib.alias("contribution_pp"),
    ).orderBy("month_start", "prio")


# ---------------------------------------------------------------------------
# Revision analysis (round 6): how much do first estimates move before
# settling? Treating (user_id = series, calendar day = ref period,
# re-publications ordered by (ts, event_id)) as the WDS revision
# stream — the vintage-triangle summary a statistical agency publishes
# about itself. First/final per (series, day) use the same single
# min_by/max_by struct-key aggregation as events_ohlc_hourly (one
# map-combinable shuffle); the per-series rollup then runs on the tiny
# (series × day) table with exact integer-cents revision magnitudes.
# ---------------------------------------------------------------------------


@query(
    "statcan_revision_analysis",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS ref_date, value,
         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                            ORDER BY ts DESC, event_id DESC) AS rn_d,
         count(*) OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')) AS n_pubs
  FROM events
), per_obs AS (
  SELECT user_id, ref_date,
         max(CASE WHEN rn_a = 1 THEN {sql_cents("value")} END) AS first_c,
         max(CASE WHEN rn_d = 1 THEN {sql_cents("value")} END) AS final_c,
         max(n_pubs) AS n_pubs
  FROM ranked GROUP BY user_id, ref_date
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(CASE WHEN n_pubs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_republished,
       CAST(sum(CASE WHEN final_c <> first_c THEN 1 ELSE 0 END) AS BIGINT) AS n_revised,
       CAST(sum(abs(final_c - first_c)) AS BIGINT) AS total_abs_revision_c,
       {R("(CAST(sum(abs(final_c - first_c)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE))", 4)}
         AS mean_abs_revision
FROM per_obs
GROUP BY user_id
ORDER BY user_id
""",
)
def statcan_revision_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import cents

    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    per_obs = (
        ev.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("ref_date"),
            cents("value").alias("c"),
            key.alias("k"),
        )
        .groupBy("user_id", "ref_date")
        .agg(
            F.expr("min_by(c, k)").alias("first_c"),
            F.expr("max_by(c, k)").alias("final_c"),
            F.count(F.lit(1)).alias("n_pubs"),
        )
    )
    return (
        per_obs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(F.when(F.col("n_pubs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_republished"),
            F.sum(F.when(F.col("final_c") != F.col("first_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_revised"),
            F.sum(F.abs(F.col("final_c") - F.col("first_c")))
            .cast("long")
            .alias("total_abs_revision_c"),
        )
        .withColumn(
            "mean_abs_revision",
            pround(
                F.col("total_abs_revision_c").cast("double")
                / F.lit(100.0)
                / F.col("n_obs").cast("double"),
                4,
            ),
        )
        .orderBy("user_id")
    )
