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
