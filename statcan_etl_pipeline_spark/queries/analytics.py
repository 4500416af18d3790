"""Customer/behavior analytics (round 2): RFM segmentation and
time-series anomaly detection — the reporting queries an ETL pipeline
feeds, expressed Spark-first.

Parity: ntile() is deterministic once the window ordering is total
(unique tie-break keys on both engines); the z-score is derived from
exact integer count sums (the variance_order_value fixed-point
pattern), so the doubles are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import (
    money_sum,
    pround,
    sql_money_sum as MS,
    sql_round as R,
)
from ..registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# RFM segmentation: per-customer recency/frequency/monetary, quartiled
# with ntile over a TOTAL order (tie-break on custkey makes the quartile
# assignment deterministic and engine-portable), then segment counts.
# ---------------------------------------------------------------------------
@query(
    "rfm_segments",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         {MS("o_totalprice")} AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f_q,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey)   AS m_q
  FROM rfm
)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
""",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        money_sum("o_totalprice").alias("monetary"),
    )
    # NB: three global ntiles on the POST-AGGREGATE table (one row per
    # customer — 10^2 smaller than orders; at warehouse scale swap for
    # approx quantile cutpoints to avoid the single-partition sort).
    scored = rfm.select(
        "o_custkey",
        F.ntile(4).over(W.orderBy(F.desc("last_order"), "o_custkey")).alias("r_q"),
        F.ntile(4).over(W.orderBy(F.desc("frequency"), "o_custkey")).alias("f_q"),
        F.ntile(4).over(W.orderBy(F.desc("monetary"), "o_custkey")).alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


# ---------------------------------------------------------------------------
# Hourly-count anomaly detection per event type: z-score of each hour's
# event count against that type's full-series mean/stddev, computed
# from exact integer sums (n, Σn, Σn²), flagging |z| ≥ 2.
# ---------------------------------------------------------------------------
@query(
    "events_hourly_anomalies",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n
  FROM events GROUP BY event_type, hour
), stats AS (
  SELECT event_type,
         count(*) AS n_hours,
         CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx
  FROM hourly GROUP BY event_type
), z AS (
  SELECT h.event_type, h.hour, h.n,
         ((CAST(h.n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n_hours AS DOUBLE))
          / sqrt((CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n_hours AS DOUBLE) * (CAST(n_hours AS DOUBLE) - 1.0)))) AS zscore
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
  WHERE n_hours > 1
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n, {R("zscore", 4)} AS zscore
FROM z
WHERE abs(zscore) >= 2.0
ORDER BY event_type, hour
""",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").cast("long").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sxx"),
    )
    nh = F.col("n_hours").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    stddev = F.sqrt((nh * sxxd - sxd * sxd) / (nh * (nh - F.lit(1.0))))
    z = (
        hourly.join(F.broadcast(stats.filter(F.col("n_hours") > 1)), "event_type")
        .withColumn(
            "zscore", (F.col("n").cast("double") - sxd / nh) / stddev
        )
    )
    return (
        z.filter(F.abs(F.col("zscore")) >= 2.0)
        .select(
            "event_type", "hour", F.col("n").cast("long").alias("n"),
            pround("zscore", 4).alias("zscore"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# Market-basket affinity: part pairs co-occurring in the same order,
# with lift = P(a,b) / (P(a)·P(b)) from exact integer counts. The pair
# generation is an orderkey-bucketed self-join (the shingle-join
# pattern) — never a cross join; per-order fanout is C(items, 2).
# ---------------------------------------------------------------------------
@query(
    "basket_part_affinity",
    oracle=f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
part_n AS (SELECT l_partkey, count(*) AS n_p FROM op GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
)
SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
       {R("(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(pa.n_p AS DOUBLE) * CAST(pb.n_p AS DOUBLE)))", 4)} AS lift
FROM pairs
JOIN part_n pa ON pa.l_partkey = part_a
JOIN part_n pb ON pb.l_partkey = part_b
CROSS JOIN n_orders
WHERE n_ab >= 3
ORDER BY n_ab DESC, part_a, part_b
LIMIT 50
""",
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n"))
    part_n = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = op.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, (a.l_orderkey == b.ok_b) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    pa = part_n.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_pa"))
    pb = part_n.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_pb"))
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            pround(
                F.col("n_ab").cast("double")
                * F.col("n").cast("double")
                / (F.col("n_pa").cast("double") * F.col("n_pb").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "part_a", "part_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) classification: parts ranked by revenue; class A = first
# 80% of cumulative revenue, B = to 95%, C = rest. Cumulative sums run
# over exact integer cents; the class boundaries cross-multiply
# integers so the comparison is exact on both engines.
# ---------------------------------------------------------------------------
@query(
    "abc_part_classification",
    oracle=f"""
WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rev_c,
         CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS BIGINT) AS cum_c,
         CAST(sum(rev_c) OVER () AS BIGINT) AS tot_c
  FROM pr
), classed AS (
  SELECT l_partkey, rev_c,
         CASE WHEN cum_c * 100 <= tot_c * 80 THEN 'A'
              WHEN cum_c * 100 <= tot_c * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc,
       CAST(count(*) AS BIGINT) AS n_parts,
       (CAST(sum(rev_c) AS BIGINT) / 100.0) AS revenue
FROM classed
GROUP BY abc
ORDER BY abc
""",
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.floor(rev * F.lit(100.0) + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    # Distributed cumulative sum (round 5): a bare W.orderBy(...) window
    # would drag every part through ONE task (|parts| can be 10⁸ at
    # warehouse scale). Two-pass prefix sum instead: range-partition by
    # the sort key so partition i globally precedes partition i+1, cumsum
    # WITHIN each range shard (parallel), then offset each shard by the
    # exclusive prefix sum of shard totals (a tiny K-row aggregate,
    # broadcast back). Shard boundaries come from range sampling and may
    # vary run-to-run, but cum_c is order-determined, so the values —
    # and the final 3-row classification — are identical regardless.
    n_shards = max(spark.sparkContext.defaultParallelism, 2)
    # localCheckpoint pins ONE materialization of the range exchange:
    # the local-cumsum branch and the shard-totals branch must see the
    # SAME shard boundaries (range sampling re-run per exchange could
    # disagree), and it cuts the second lineitem scan.
    pr_sharded = (
        pr.repartitionByRange(n_shards, F.desc("rev_c"), F.asc("l_partkey"))
        .withColumn("shard", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = (
        W.partitionBy("shard")
        .orderBy(F.desc("rev_c"), "l_partkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = pr_sharded.withColumn(
        "local_cum", F.sum("rev_c").over(w_local).cast("long")
    )
    shard_totals = pr_sharded.groupBy("shard").agg(
        F.sum("rev_c").cast("long").alias("shard_rev")
    )
    # K rows total — this window runs over the tiny aggregate, not parts
    w_off = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    offsets = shard_totals.select(
        "shard",
        F.coalesce(F.sum("shard_rev").over(w_off), F.lit(0))
        .cast("long")
        .alias("shard_offset"),
        F.sum("shard_rev").over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        )
        .cast("long")
        .alias("tot_c"),
    )
    ranked = local.join(F.broadcast(offsets), ["shard"]).select(
        "l_partkey",
        "rev_c",
        (F.col("shard_offset") + F.col("local_cum")).cast("long").alias("cum_c"),
        "tot_c",
    )
    abc = (
        F.when(F.col("cum_c") * 100 <= F.col("tot_c") * 80, "A")
        .when(F.col("cum_c") * 100 <= F.col("tot_c") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select("rev_c", abc.alias("abc"))
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            (F.sum("rev_c").cast("long") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# DAU / WAU engagement: daily actives, the trailing-7-day actives for
# the same day, and the DAU/WAU stickiness ratio — exact distinct
# counts, integer-ratio double.
# ---------------------------------------------------------------------------
@query(
    "events_dau_wau",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d,
         CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day_num,
         user_id
  FROM events
), dau AS (
  SELECT d, day_num, count(*) AS dau FROM du GROUP BY d, day_num
), wau AS (
  SELECT a.d, a.day_num, count(DISTINCT b.user_id) AS wau
  FROM dau a JOIN du b ON b.day_num BETWEEN a.day_num - 6 AND a.day_num
  GROUP BY a.d, a.day_num
)
SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       {R("(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE))", 4)} AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY dau.d
""",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day_num"),
        "user_id",
    ).distinct()
    dau = du.groupBy("d", "day_num").agg(F.count(F.lit(1)).alias("dau"))
    # trailing-7d distinct: range join day buckets (7× fanout, bounded)
    b = du.select(F.col("day_num").alias("bday"), F.col("user_id").alias("buser"))
    wau = (
        dau.select("d", "day_num")
        .join(
            b,
            (F.col("bday") >= F.col("day_num") - 6)
            & (F.col("bday") <= F.col("day_num")),
        )
        .groupBy("d", "day_num")
        .agg(F.countDistinct("buser").alias("wau"))
    )
    return (
        dau.join(wau, ["d", "day_num"])
        .select(
            "d",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            pround(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 4
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics (round 5): the Markov transition matrix and
# inter-arrival statistics a behavior-modeling (or session-LM training
# data) pipeline computes over the event stream. Both are one window
# pass partitioned by user_id — the shuffle key is the natural entity
# key, partitions are per-user and small, no global ordering anywhere.
# The window order is total (ts, event_id) so lead/lag are
# deterministic on both engines.
# ---------------------------------------------------------------------------
@query(
    "events_user_transitions",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), tot AS (
  SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS from_total
  FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.n_trans,
       {R("(CAST(p.n_trans AS DOUBLE) / CAST(t.from_total AS DOUBLE))", 6)} AS prob
FROM pairs p JOIN tot t ON p.from_type = t.from_type
ORDER BY p.from_type, p.to_type
""",
)
def events_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive event types within each user's timeline."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    tot = pairs.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("from_total")
    )
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_trans",
            pround(
                F.col("n_trans").cast("double") / F.col("from_total").cast("double"),
                6,
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_interarrival_stats",
    oracle=f"""
WITH seq AS (
  SELECT event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), gaps AS (
  SELECT event_type, us - prev_us AS gap_us
  FROM seq WHERE prev_us IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       {R("(CAST(sum(gap_us) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE))", 6)}
         AS avg_gap_s
FROM gaps GROUP BY event_type ORDER BY event_type
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap stats between consecutive events of each user,
    grouped by the type of the LATER event. The average comes from an
    exact int64 microsecond sum — no double accumulation."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            pround(
                F.sum("gap_us").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Per-type linear trend (round 5): OLS slope/intercept of daily event
# counts against the day index — closed-form regression from integer
# moment sums (n, Σx, Σy, Σxy, Σx²), which stay exact in int64, so
# no Pandas UDF and no accumulation-order drift: the one double
# division happens at the end on both engines. The moment aggregate is
# a single map-side-combined shuffle on event_type; x is the day
# offset from the global min date (a broadcast scalar).
# ---------------------------------------------------------------------------
@query(
    "events_daily_trend",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), x0 AS (
  SELECT min(d) AS d0 FROM daily
), m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(datediff('day', x0.d0, d)) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(datediff('day', x0.d0, d) * y) AS BIGINT) AS sxy,
         CAST(sum(datediff('day', x0.d0, d) * datediff('day', x0.d0, d)) AS BIGINT) AS sxx
  FROM daily CROSS JOIN x0 GROUP BY event_type
)
SELECT event_type, n,
       {R("(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))", 6)}
         AS slope,
       {R("(CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)"
          " / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))"
          " / CAST(n AS DOUBLE)", 6)} AS intercept
FROM m ORDER BY event_type
""",
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count trend per event type: is each event stream growing
    or shrinking, and from what base — the drift monitor a pipeline
    alerts on."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    x0 = daily.agg(F.min("d").alias("d0"))
    x = F.datediff(F.col("d"), F.col("d0")).cast("long")
    m = (
        daily.crossJoin(F.broadcast(x0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(x).cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(x * F.col("y")).cast("long").alias("sxy"),
            F.sum(x * x).cast("long").alias("sxx"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "event_type",
        "n",
        pround(slope, 6).alias("slope"),
        pround(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
    ).orderBy("event_type")
