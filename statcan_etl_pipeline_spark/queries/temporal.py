"""Temporal queries over the `events` stream-shaped table: as-of join,
range join, gap sessionization, tumbling-window aggregation (the batch
twin of the streaming job in streaming/jobs.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import money_sum, sql_money_sum as MS
from ..operators.temporal import asof_join_backward, sessionize
from ..registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent prior view
# ---------------------------------------------------------------------------
@query(
    "asof_join_purchase_to_view",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, ts, 0 AS src, event_id AS view_id, NULL AS purchase_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1 AS src, NULL AS view_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT *,
    last_value(view_id IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view_id,
    last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_ts
  FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS purchase_ts,
       matched_view_id AS view_id,
       strftime(matched_ts, '{TS_FMT_DUCK}') AS view_ts
FROM carried WHERE src = 1
ORDER BY event_id
""",
)
def asof_join_purchase_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join_backward(purchases, views, on=["user_id"], right_prefix="matched_")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.col("matched_view_id").alias("view_id"),
        F.date_format("matched_ts", TS_FMT_SPARK).alias("view_ts"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Range join: events within 1 hour after the same user's signup
# ---------------------------------------------------------------------------
@query(
    "range_join_events_after_signup",
    oracle=f"""
SELECT s.event_id AS signup_id, e.event_id AS event_id, e.event_type,
       strftime(e.ts, '{TS_FMT_DUCK}') AS event_ts
FROM events s JOIN events e
  ON s.user_id = e.user_id
 AND e.ts > s.ts
 AND e.ts <= s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
ORDER BY signup_id, event_id
""",
)
def range_join_events_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi-key on user_id keeps this a hash/sort-merge join with a range
    # residual — never a cartesian. At scale, bucket both sides by
    # user_id to co-locate.
    ev = _events(spark, sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    return (
        ev.join(
            signups,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("ts") > F.col("s_ts"))
            & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "signup_id",
            "event_id",
            "event_type",
            F.date_format("ts", TS_FMT_SPARK).alias("event_ts"),
        )
        .orderBy("signup_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (30-minute inactivity gap)
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
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
)
SELECT user_id, session_id,
       count(*) AS n_events,
       strftime(min(ts), '{TS_FMT_DUCK}') AS start_ts,
       strftime(max(ts), '{TS_FMT_DUCK}') AS end_ts,
       {MS("value")} AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak=["event_id"])
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("start_ts"),
            F.date_format(F.max("ts"), TS_FMT_SPARK).alias("end_ts"),
            money_sum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) window: 1-hour windows every 15 minutes — each event
# lands in 4 overlapping windows. Oracle reproduces Spark's epoch-aligned
# hopping semantics by fanning each event to its 4 window starts.
# ---------------------------------------------------------------------------
@query(
    "events_sliding_1h_15m",
    oracle=f"""
WITH fanned AS (
  SELECT e.*, time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE AS w_start
  FROM events e, (SELECT unnest(range(0, 4)) AS k) k
  WHERE ts >= time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
    AND ts <  time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE + INTERVAL 1 HOUR
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n,
       {MS("value")} AS total_value
FROM fanned
GROUP BY window_start
ORDER BY window_start
""",
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
@query(
    "setops_active_users",
    oracle="""
SELECT user_id FROM
  ((SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
   INTERSECT
   (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
   EXCEPT
   (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'))
ORDER BY user_id
""",
)
def setops_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def users(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select("user_id").distinct()

    return (
        users("purchase").intersect(users("view")).exceptAll(users("error")).orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Funnel: view → click-after-view → purchase-after-click conversion
# ---------------------------------------------------------------------------
@query(
    "events_funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


# ---------------------------------------------------------------------------
# Histogram: fixed-width value buckets
# ---------------------------------------------------------------------------
@query(
    "histogram_order_values",
    oracle=f"""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       count(*) AS n,
       {MS("o_totalprice")} AS total
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
)
def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), money_sum("o_totalprice").alias("total"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Tumbling 1-hour window aggregation (batch parity of the streaming job)
# ---------------------------------------------------------------------------
@query(
    "events_tumbling_1h",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       count(*) AS n,
       {MS("value")} AS total_value
FROM events
GROUP BY bucket_start, event_type
ORDER BY bucket_start, event_type
""",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# As-of join with a match TOLERANCE (pandas merge_asof(tolerance=...)):
# the most recent prior view counts only when it is within 15 minutes
# of the purchase — stale matches are nulled, not dropped (the left
# row always survives). Same single-shuffle union+carry as the plain
# backward as-of; the tolerance is one integer-microsecond comparison
# applied after the carry.
# ---------------------------------------------------------------------------

_TOL_US = 15 * 60 * 1_000_000


@query(
    "asof_join_with_tolerance",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, ts, 0 AS src, event_id AS view_id, NULL AS purchase_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1 AS src, NULL AS view_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT *,
    last_value(view_id IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view_id,
    last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_ts
  FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       strftime(ts, '{{TSF}}') AS purchase_ts,
       CASE WHEN epoch_us(ts) - epoch_us(matched_ts) <= {_TOL_US}
            THEN matched_view_id END AS view_id,
       CASE WHEN epoch_us(ts) - epoch_us(matched_ts) <= {_TOL_US}
            THEN strftime(matched_ts, '{{TSF}}') END AS view_ts,
       (matched_ts IS NOT NULL
        AND epoch_us(ts) - epoch_us(matched_ts) > {_TOL_US}) AS stale_dropped
FROM carried WHERE src = 1
ORDER BY event_id
""".replace("{TSF}", TS_FMT_DUCK),
)
def asof_join_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join_backward(
        purchases, views, on=["user_id"], right_prefix="matched_"
    )
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("matched_ts").cast("timestamp")
    )
    in_tol = gap <= F.lit(_TOL_US)
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.when(in_tol, F.col("matched_view_id")).alias("view_id"),
        F.when(in_tol, F.date_format("matched_ts", TS_FMT_SPARK)).alias("view_ts"),
        (F.col("matched_ts").isNotNull() & ~in_tol.eqNullSafe(F.lit(True)))
        .alias("stale_dropped"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Running DISTINCT users per day — the op naive SQL can't scale
# (cumulative COUNT(DISTINCT) re-scans history). Rewrite: each user
# contributes only at their FIRST day (one per-user min), the per-day
# first-appearance counts aggregate map-side, and the running sum runs
# over the calendar-bounded daily series. O(users) + O(days) instead
# of O(days × history).
# ---------------------------------------------------------------------------


@query(
    "events_cumulative_unique_users",
    oracle="""
WITH first_day AS (
  SELECT user_id,
         CAST(min(floor(epoch(ts) / 86400.0)) AS BIGINT) AS day_num
  FROM events GROUP BY user_id
), new_per_day AS (
  SELECT day_num, CAST(count(*) AS BIGINT) AS n_new
  FROM first_day GROUP BY day_num
), all_days AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day_num FROM events
)
SELECT d.day_num,
       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day_num
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM all_days d LEFT JOIN new_per_day n ON d.day_num = n.day_num
ORDER BY d.day_num
""",
)
def events_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _events(spark, sf_dir)
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long")
    first_day = ev.groupBy("user_id").agg(F.min(day).alias("day_num"))
    new_per_day = first_day.groupBy("day_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    all_days = ev.select(day.alias("day_num")).distinct()
    wcum = W.orderBy("day_num").rowsBetween(W.unboundedPreceding, W.currentRow)
    # the running sum is over the POST-AGGREGATE daily series
    # (calendar-bounded) — same precedent as orders_open_intervals_daily
    return (
        all_days.join(new_per_day, "day_num", "left")
        .select("day_num", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"))
        .select(
            "day_num",
            "n_new",
            F.sum("n_new").over(wcum).cast("long").alias("cumulative_users"),
        )
        .orderBy("day_num")
    )


# ---------------------------------------------------------------------------
# Session-duration histogram — the composite: gap sessionization feeds
# a fixed-width (5-minute) duration histogram. Durations are exact
# integer microseconds from the per-session min/max, so bucket edges
# are integer divisions; single-event sessions land in bucket 0.
# ---------------------------------------------------------------------------


@query(
    "session_duration_histogram",
    oracle="""
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
), spans AS (
  SELECT user_id, session_id,
         max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT CAST(floor(dur_us / 300000000.0) AS BIGINT) AS bucket_5min,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(min(dur_us) AS BIGINT) AS min_dur_us,
       CAST(max(dur_us) AS BIGINT) AS max_dur_us
FROM spans
GROUP BY 1
ORDER BY 1
""",
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak=["event_id"])
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    spans = sess.groupBy("user_id", "session_id").agg(
        (F.max(us) - F.min(us)).alias("dur_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        spans.groupBy(
            F.floor(F.col("dur_us") / F.lit(300000000.0)).cast("long").alias("bucket_5min")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("dur_us").cast("long").alias("min_dur_us"),
            F.max("dur_us").cast("long").alias("max_dur_us"),
        )
        .orderBy("bucket_5min")
    )


# ---------------------------------------------------------------------------
# Time-decayed multi-touch attribution (round 6): every purchase
# distributes credit to the user's preceding events within 1 hour,
# weighted 2^-1, 2^-2, ... by recency rank (capped at 20 touches).
# Because the weights are DYADIC (exact powers of two) every credit,
# and every sum of credits, is exactly representable — the whole
# attribution table is float-EXACT in both engines, no rounding
# needed. The touch lookup is the house banded range join: equi-join
# on (user, hour-band) probing the purchase's band and the one before
# (never a fact x fact inequality join), and the recency rank window
# partitions by the purchase id (bounded by touches-per-hour).
# ---------------------------------------------------------------------------

_ATTR_CAP = 20


@query(
    "events_multitouch_attribution",
    oracle=f"""
WITH pur AS (
  SELECT event_id AS pid, user_id, ts,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS band
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS band
  FROM events WHERE event_type <> 'purchase'
), probes AS (
  SELECT pid, user_id, ts, band AS pband FROM pur
  UNION ALL
  SELECT pid, user_id, ts, band - 1 FROM pur
), cand AS (
  SELECT p.pid, t.event_id, t.event_type, t.ts AS tts, p.ts AS pts
  FROM probes p JOIN touch t
    ON p.user_id = t.user_id AND p.pband = t.band
  WHERE t.ts < p.ts AND t.ts >= p.ts - INTERVAL 1 HOUR
), ranked AS (
  SELECT pid, event_type,
         row_number() OVER (PARTITION BY pid ORDER BY tts DESC, event_id) AS rk
  FROM cand
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       sum(power(2.0, -rk)) AS credit
FROM ranked
WHERE rk <= {_ATTR_CAP}
GROUP BY event_type
ORDER BY event_type
""",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    band = F.floor(F.unix_micros("ts") / F.lit(3600000000)).cast("long")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        band.alias("pband"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "event_id",
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        "event_type",
        band.alias("tband"),
    )
    probes = pur.select("pid", "pu", "pts", "pband").unionAll(
        pur.select("pid", "pu", "pts", (F.col("pband") - 1).alias("pband"))
    )
    cand = probes.join(
        touch,
        (F.col("pu") == F.col("tu")) & (F.col("pband") == F.col("tband")),
    ).filter(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
    )
    wrk = W.partitionBy("pid").orderBy(F.desc("tts"), F.asc("event_id"))
    ranked = cand.select(
        "pid", "event_type", F.row_number().over(wrk).alias("rk")
    ).filter(F.col("rk") <= _ATTR_CAP)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum(F.pow(F.lit(2.0), -F.col("rk").cast("double"))).alias("credit"),
        )
        .orderBy("event_type")
    )
