"""Round-6 batch 2: entity resolution, session path mining, cohort
survival, join-key skew diagnostics, and sequential-fold EWMA.

House rules as everywhere: exact integer arithmetic before any
division, pround/sql_round twins for doubles, deterministic tie-breaks,
windows only over bounded aggregates (never the raw fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_round as R
from ..operators.resolution import fastss_pairs
from ..operators.temporal import sessionize
from ..registry import query

# ---------------------------------------------------------------------------
# Entity resolution: all supplier-name pairs within edit distance 1,
# generated with FastSS deletion-neighborhood blocking (see
# operators/resolution.py) — an equi-join on deletion variants, never
# a cross join. The DuckDB oracle IS the naive quadratic definition
# (cross join + levenshtein), so parity proves the blocked plan loses
# no pair. At 100 TB the Spark side's candidate count stays bounded
# per variant bucket; the oracle's cross join is viable only because
# oracle inputs are small by design.
# ---------------------------------------------------------------------------


@query(
    "er_supplier_name_pairs",
    oracle="""
SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
       a.s_name AS a_name, b.s_name AS b_name,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
ORDER BY a_id, b_id
""",
)
def er_supplier_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    pairs = fastss_pairs(sup, id_col="s_suppkey", name_col="s_name", max_dist=1)
    return pairs.select(
        "a_id", "b_id", "a_name", "b_name", F.col("dist").cast("int").alias("dist")
    ).orderBy("a_id", "b_id")


# ---------------------------------------------------------------------------
# Session path mining: the 20 most common event-type journeys per
# 30-minute-gap session ("view>click>purchase"). Reuses the
# sessionize operator; the path string is assembled JVM-side with
# array_sort(collect_list(struct)) + transform — per-session arrays
# are bounded by session length, and the final top-20 ranks the small
# (distinct paths) aggregate, not the fact table.
# ---------------------------------------------------------------------------


@query(
    "session_top_paths",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, session_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak=["event_id"])
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Cohort survival curve: fraction of users still active k weeks after
# their first event (discrete Kaplan-Meier with no censoring — every
# user's horizon is their own last event). One pass computes each
# user's max week offset (datediff of min/max day — offsets are
# monotone in event date, so the extremes suffice); the reverse
# cumulative count runs over the tiny offset distribution (≤ #weeks
# rows), never over users. Rates are exact-integer ratios rounded with
# the portable twins.
# ---------------------------------------------------------------------------


@query(
    "user_weekly_survival",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(floor(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) / 7) AS BIGINT) AS max_off
  FROM events GROUP BY user_id
), dist AS (
  SELECT max_off, count(*) AS n_users FROM per_user GROUP BY max_off
), spine AS (
  SELECT unnest(generate_series(0, (SELECT max(max_off) FROM dist))) AS week_offset
)
SELECT s.week_offset,
       CAST(sum(d.n_users) FILTER (WHERE d.max_off >= s.week_offset) AS BIGINT) AS surviving,
       {R("CAST(sum(d.n_users) FILTER (WHERE d.max_off >= s.week_offset) AS DOUBLE)"
          " / (SELECT count(*) FROM per_user)", 6)} AS survival_rate
FROM spine s CROSS JOIN dist d
GROUP BY s.week_offset
ORDER BY s.week_offset
""",
)
def user_weekly_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) / 7
        ).alias("max_off")
    )
    dist = per_user.groupBy("max_off").agg(F.count(F.lit(1)).alias("n_users"))
    spine = dist.agg(
        F.max("max_off").alias("mx"), F.sum("n_users").alias("total")
    ).select(F.explode(F.sequence(F.lit(0).cast("long"), "mx")).alias("week_offset"), "total")
    # reverse cumulative count over the ≤#weeks-row distribution — a
    # bounded-aggregate window, per the house two-pass pattern
    joined = spine.join(dist, spine.week_offset == dist.max_off, "left").select(
        "week_offset", "total", F.coalesce("n_users", F.lit(0)).alias("n_users")
    )
    w = W.orderBy(F.desc("week_offset")).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        joined.withColumn("surviving", F.sum("n_users").over(w).cast("long"))
        .select(
            "week_offset",
            "surviving",
            pround(F.col("surviving").cast("double") / F.col("total"), 6).alias(
                "survival_rate"
            ),
        )
        .orderBy("week_offset")
    )


# ---------------------------------------------------------------------------
# Join-key skew report: the pre-flight diagnostic you run BEFORE
# shuffling 100 TB on a key — rows, distinct keys, the heaviest key
# and its share, and the max/avg skew ratio for the three hottest join
# keys in the schema. One groupBy per key (partial-aggregatable) plus
# a single-row argmax agg via max(struct(cnt, -key)) — deterministic
# (smallest key wins ties), no windows, no second pass over the fact
# table. skew_ratio ≫ 1 is the signal to slat/AQE the join.
# ---------------------------------------------------------------------------

_SKEW_ORACLE_ONE = """
SELECT '{label}' AS key_name,
       CAST((SELECT count(*) FROM {tbl}) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_per_key,
       (SELECT min(k) FROM (SELECT {key} AS k, count(*) AS c FROM {tbl} GROUP BY {key})
        WHERE c = (SELECT max(c) FROM (SELECT count(*) AS c FROM {tbl} GROUP BY {key}))) AS hot_key,
       {avg_expr} AS avg_per_key,
       {skew_expr} AS skew_ratio
FROM (SELECT {key}, count(*) AS cnt FROM {tbl} GROUP BY {key})
"""


def _skew_oracle(label: str, tbl: str, key: str) -> str:
    avg = R(f"CAST((SELECT count(*) FROM {tbl}) AS DOUBLE) / count(*)", 4)
    skew = R(f"CAST(max(cnt) * count(*) AS DOUBLE) / (SELECT count(*) FROM {tbl})", 4)
    return _SKEW_ORACLE_ONE.format(
        label=label, tbl=tbl, key=key, avg_expr=avg, skew_expr=skew
    )


@query(
    "join_key_skew_report",
    oracle=(
        _skew_oracle("lineitem.l_partkey", "lineitem", "l_partkey")
        + " UNION ALL "
        + _skew_oracle("lineitem.l_suppkey", "lineitem", "l_suppkey")
        + " UNION ALL "
        + _skew_oracle("orders.o_custkey", "orders", "o_custkey")
        + " ORDER BY key_name"
    ),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(tbl: DataFrame, label: str, key: str) -> DataFrame:
        cnts = tbl.groupBy(F.col(key).cast("long").alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return cnts.agg(
            F.lit(label).alias("key_name"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_per_key"),
            # argmax with smallest-key tie-break: struct compare is
            # lexicographic, -k turns "max key" into "min key"
            (-F.max(F.struct(F.col("cnt"), (-F.col("k")).alias("nk")))["nk"])
            .cast("long")
            .alias("hot_key"),
            pround(F.sum("cnt").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_per_key"
            ),
            pround(
                (F.max("cnt") * F.count(F.lit(1))).cast("double") / F.sum("cnt"), 4
            ).alias("skew_ratio"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    return (
        one(li, "lineitem.l_partkey", "l_partkey")
        .unionByName(one(li, "lineitem.l_suppkey", "l_suppkey"))
        .unionByName(one(od, "orders.o_custkey", "o_custkey"))
        .orderBy("key_name")
    )


# ---------------------------------------------------------------------------
# EWMA smoothing (alpha = 0.5) of the daily event count per type,
# emitted as a full series. The recurrence ewma_t = 0.5·ewma_{t-1} +
# 0.5·x_t is inherently sequential, so both engines run the SAME fold
# in the SAME order: Spark as an `aggregate` HOF over the
# array_sort'ed per-type daily series (bounded: one element per
# calendar day), DuckDB as a recursive CTE stepping day-by-day.
# Multiplying by 0.5 is exact in IEEE-754 (exponent decrement) and the
# single addition per step rounds identically in both engines, so the
# unrounded doubles are bit-identical; pround(6) is belt-and-braces.
# Per-type state never touches the driver and the fact table is
# aggregated before any per-day work.
# ---------------------------------------------------------------------------

_EWMA_SPARK = """
aggregate(
  a,
  named_struct('v', CAST(0.0 AS DOUBLE),
               'out', CAST(array() AS ARRAY<STRUCT<day: DATE, n: BIGINT, e: DOUBLE>>)),
  (acc, x) -> named_struct(
      'v', CASE WHEN size(acc.out) = 0 THEN CAST(x.n AS DOUBLE)
                ELSE acc.v * 0.5 + CAST(x.n AS DOUBLE) * 0.5 END,
      'out', array_append(acc.out, named_struct(
          'day', x.day, 'n', x.n,
          'e', CASE WHEN size(acc.out) = 0 THEN CAST(x.n AS DOUBLE)
                    ELSE acc.v * 0.5 + CAST(x.n AS DOUBLE) * 0.5 END))),
  acc -> acc.out)
"""


@query(
    "events_ewma_daily",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), idx AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), ew AS (
  SELECT event_type, day, n, rn, CAST(n AS DOUBLE) AS e
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.event_type, i.day, i.n, i.rn, w.e * 0.5 + CAST(i.n AS DOUBLE) * 0.5
  FROM ew w JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS daily_n, {R("e", 6)} AS ewma
FROM ew
ORDER BY event_type, day
""",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    per_type = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("a")
    )
    return (
        per_type.select("event_type", F.explode(F.expr(_EWMA_SPARK)).alias("s"))
        .select(
            "event_type",
            F.date_format(F.col("s.day"), "yyyy-MM-dd").alias("day"),
            F.col("s.n").alias("daily_n"),
            pround(F.col("s.e"), 6).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices by ship year (base 1995)
# — the statistics-agency deflator pipeline. Per (year, part) unit
# values are exact int64 cent/unit sums; the per-part unit price is
# rounded to integer cents with ONE portable floor(x+0.5) (int64→
# double is exact below 2^53 and the quotient is correctly rounded, so
# both engines agree bit-for-bit); basket sums are integer products
# accumulated in DECIMAL(38,0)/HUGEINT (no float accumulation
# anywhere); matched sample = parts present in both base and current
# year (inner join on the broadcastable base basket). sqrt for Fisher
# is IEEE-correctly-rounded in both engines.
# ---------------------------------------------------------------------------

_PI_R = "CAST({n} AS DOUBLE) / CAST({d} AS DOUBLE)"


@query(
    "price_index_fisher",
    oracle=f"""
WITH py AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_partkey,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS extc,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty
  FROM lineitem GROUP BY year(l_shipdate), l_partkey
), up AS (
  SELECT yr, l_partkey, qty,
         CAST(floor(CAST(extc AS DOUBLE) / qty + 0.5) AS BIGINT) AS upc
  FROM py WHERE qty > 0
), base AS (
  SELECT l_partkey, qty AS q0, upc AS upc0 FROM up WHERE yr = 1995
), j AS (
  SELECT u.yr,
         sum(u.upc * b.q0) AS numer_l, sum(b.upc0 * b.q0) AS denom_l,
         sum(u.upc * u.qty) AS numer_p, sum(b.upc0 * u.qty) AS denom_p
  FROM up u JOIN base b USING (l_partkey)
  GROUP BY u.yr
)
SELECT yr,
       {R(_PI_R.format(n='numer_l', d='denom_l') + ' * 100.0', 4)} AS laspeyres,
       {R(_PI_R.format(n='numer_p', d='denom_p') + ' * 100.0', 4)} AS paasche,
       {R('sqrt((' + R(_PI_R.format(n='numer_l', d='denom_l') + ' * 100.0', 4)
          + ') * (' + R(_PI_R.format(n='numer_p', d='denom_p') + ' * 100.0', 4) + '))', 4)} AS fisher
FROM j
ORDER BY yr
""",
)
def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.year("l_shipdate").cast("long").alias("yr"), "l_partkey"
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")).alias("extc"),
        F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long")).alias("qty"),
    )
    up = py.filter(F.col("qty") > 0).select(
        "yr",
        "l_partkey",
        "qty",
        F.floor(F.col("extc").cast("double") / F.col("qty") + 0.5)
        .cast("long")
        .alias("upc"),
    )
    base = up.filter(F.col("yr") == 1995).select(
        "l_partkey", F.col("qty").alias("q0"), F.col("upc").alias("upc0")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — overflow-proof sums
    j = (
        up.join(F.broadcast(base), "l_partkey")
        .groupBy("yr")
        .agg(
            F.sum(dec(F.col("upc") * F.col("q0"))).alias("numer_l"),
            F.sum(dec(F.col("upc0") * F.col("q0"))).alias("denom_l"),
            F.sum(dec(F.col("upc") * F.col("qty"))).alias("numer_p"),
            F.sum(dec(F.col("upc0") * F.col("qty"))).alias("denom_p"),
        )
    )
    lasp = pround(
        F.col("numer_l").cast("double") / F.col("denom_l").cast("double") * 100.0, 4
    )
    paas = pround(
        F.col("numer_p").cast("double") / F.col("denom_p").cast("double") * 100.0, 4
    )
    return (
        j.select("yr", lasp.alias("laspeyres"), paas.alias("paasche"))
        .select(
            "yr",
            "laspeyres",
            "paasche",
            pround(F.sqrt(F.col("laspeyres") * F.col("paasche")), 4).alias("fisher"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Customer value-quartile migration matrix: quartile by revenue in the
# early period (≤1997) vs the late period (≥1998), counted over
# customers active in both. Quartile = 1 + (4·(rank−1)) DIV n with
# rank = exact global row_number — computed with the house two-pass
# distributed ranking (range-partition by the sort key, local
# row_number per shard, shard-count offsets from a tiny broadcast
# aggregate), NEVER a bare global-ordered window over customers. The
# oracle uses the same closed-form quartile from a plain row_number,
# so parity also proves the two-pass rank is exactly the global rank.
# ---------------------------------------------------------------------------

_MIG_PERIOD = """
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
  FROM orders WHERE {cond} GROUP BY o_custkey
"""


def _mig_ranked(alias: str, cond: str) -> str:
    return f"""
{alias}_rev AS ({_MIG_PERIOD.format(cond=cond)}),
{alias}_n AS (SELECT count(*) AS n FROM {alias}_rev),
{alias}_q AS (
  SELECT o_custkey,
         CAST(1 + (4 * (row_number() OVER (ORDER BY rev_c DESC, o_custkey) - 1))
              // (SELECT n FROM {alias}_n) AS BIGINT) AS q
  FROM {alias}_rev
)"""


@query(
    "customer_value_migration",
    oracle=f"""
WITH {_mig_ranked('a', "year(o_orderdate) <= 1997")},
{_mig_ranked('b', "year(o_orderdate) >= 1998")[1:]}
SELECT a.q AS from_quartile, b.q AS to_quartile,
       CAST(count(*) AS BIGINT) AS n_customers
FROM a_q a JOIN b_q b USING (o_custkey)
GROUP BY a.q, b.q
ORDER BY from_quartile, to_quartile
""",
)
def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")

    def quartiles(cond) -> DataFrame:
        rev = (
            od.filter(cond)
            .groupBy("o_custkey")
            .agg(
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
                .alias("rev_c")
            )
        )
        n_shards = max(od.sparkSession.sparkContext.defaultParallelism, 2)
        sharded = (
            rev.repartitionByRange(n_shards, F.desc("rev_c"), F.asc("o_custkey"))
            .withColumn("shard", F.spark_partition_id())
            .localCheckpoint(eager=True)  # pin ONE set of shard boundaries
        )
        w_local = W.partitionBy("shard").orderBy(F.desc("rev_c"), "o_custkey")
        local = sharded.withColumn("local_rn", F.row_number().over(w_local))
        counts = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("c"))
        w_off = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
        offsets = counts.select(
            "shard",
            F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
            F.sum("c").over(
                W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            ).alias("n"),
        )
        return local.join(F.broadcast(offsets), "shard").select(
            "o_custkey",
            (1 + (4 * (F.col("off") + F.col("local_rn") - 1)) / F.col("n"))
            .cast("long")
            .alias("q"),
        )

    a = quartiles(F.year("o_orderdate") <= 1997).withColumnRenamed("q", "from_quartile")
    b = quartiles(F.year("o_orderdate") >= 1998).withColumnRenamed("q", "to_quartile")
    return (
        a.join(b, "o_custkey")
        .groupBy("from_quartile", "to_quartile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("from_quartile", "to_quartile")
    )


# ---------------------------------------------------------------------------
# Alerting state machine over the hourly error rate: alert iff
# errors/total > 25%, emitted ONLY at state transitions (enter/exit).
# The threshold test is the exact integer comparison 4·err > total (no
# float compare at the boundary); lag() runs over the bounded hourly
# aggregate (one row per hour), never the event stream.
# ---------------------------------------------------------------------------


@query(
    "events_error_alert_transitions",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err,
         count(*) AS tot
  FROM events GROUP BY date_trunc('hour', ts)
), flagged AS (
  SELECT hr, err, tot, (4 * err > tot) AS alert,
         lag(4 * err > tot) OVER (ORDER BY hr) AS prev_alert
  FROM hourly
)
SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(err AS BIGINT) AS err, CAST(tot AS BIGINT) AS tot,
       {R("CAST(err AS DOUBLE) / tot", 6)} AS error_rate,
       CASE WHEN alert THEN 'enter' ELSE 'exit' END AS transition
FROM flagged
WHERE (prev_alert IS NULL AND alert) OR alert <> prev_alert
ORDER BY hour_start
""",
)
def events_error_alert_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("err"),
        F.count(F.lit(1)).alias("tot"),
    )
    alert = 4 * F.col("err") > F.col("tot")
    flagged = hourly.select(
        "hr", "err", "tot", alert.alias("alert")
    ).withColumn("prev_alert", F.lag("alert").over(W.orderBy("hr")))
    return (
        flagged.filter(
            (F.col("prev_alert").isNull() & F.col("alert"))
            | (F.col("alert") != F.col("prev_alert"))
        )
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.col("err").cast("long").alias("err"),
            F.col("tot").cast("long").alias("tot"),
            pround(F.col("err").cast("double") / F.col("tot"), 6).alias("error_rate"),
            F.when(F.col("alert"), "enter").otherwise("exit").alias("transition"),
        )
        .orderBy("hour_start")
    )


# ---------------------------------------------------------------------------
# Backlog aging: open orders bucketed by age as of the latest order
# date in the data (the "as-of" anchor is a 1-row broadcast aggregate
# folded into the plan — no separate driver-side count/collect
# action). Exact cents totals per bucket.
# ---------------------------------------------------------------------------


@query(
    "orders_backlog_aging",
    oracle=f"""
WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
aged AS (
  SELECT date_diff('day', o_orderdate, maxd) AS age_days, o_totalprice
  FROM orders CROSS JOIN anchor
  WHERE o_orderstatus = 'O'
)
SELECT CASE WHEN age_days <= 30 THEN '00-030d'
            WHEN age_days <= 90 THEN '031-090d'
            WHEN age_days <= 365 THEN '091-365d'
            ELSE '366d+' END AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS open_value
FROM aged
GROUP BY 1
ORDER BY age_bucket
""",
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    anchor = od.agg(F.max("o_orderdate").alias("maxd"))
    aged = (
        od.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff("maxd", "o_orderdate").alias("age_days"), "o_totalprice"
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "00-030d")
        .when(F.col("age_days") <= 90, "031-090d")
        .when(F.col("age_days") <= 365, "091-365d")
        .otherwise("366d+")
    )
    return (
        aged.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
                .cast("double") / 100.0
            ).alias("open_value"),
        )
        .orderBy("age_bucket")
    )


# ---------------------------------------------------------------------------
# Bilateral trade-balance matrix: revenue flows supplier-nation →
# customer-nation, folded to unordered nation pairs with both
# directional flows and the net balance — the StatCan international-
# accounts shape. Dimension joins broadcast; the symmetric fold is
# least/greatest keying inside ONE aggregation over the flow fact (no
# self-join of the matrix). Exact cents throughout.
# ---------------------------------------------------------------------------


@query(
    "nation_trade_balance",
    oracle="""
WITH flows AS (
  SELECT ns.n_name AS from_nation, nc.n_name AS to_nation,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS c
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  GROUP BY ns.n_name, nc.n_name
)
SELECT least(from_nation, to_nation) AS nation_a,
       greatest(from_nation, to_nation) AS nation_b,
       CAST(sum(CASE WHEN from_nation = least(from_nation, to_nation) THEN c ELSE 0 END) AS DOUBLE) / 100.0 AS a_to_b,
       CAST(sum(CASE WHEN from_nation = greatest(from_nation, to_nation) THEN c ELSE 0 END) AS DOUBLE) / 100.0 AS b_to_a,
       CAST(sum(CASE WHEN from_nation = least(from_nation, to_nation) THEN c ELSE -c END) AS DOUBLE) / 100.0 AS net_a
FROM flows
WHERE from_nation <> to_nation
GROUP BY least(from_nation, to_nation), greatest(from_nation, to_nation)
ORDER BY nation_a, nation_b
""",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rev_c = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    flows = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        # customer is fact-scale at 100 TB — never broadcast its raw
        # scan (8 GB limit); supplier/nation stay broadcast dims.
        .join(cu.select("c_custkey", "c_nationkey"), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su.select("s_suppkey", "s_nationkey")), li.l_suppkey == su.s_suppkey)
        .join(
            F.broadcast(na.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("from_nation"))),
            su.s_nationkey == F.col("sk"),
        )
        .join(
            F.broadcast(na.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("to_nation"))),
            cu.c_nationkey == F.col("ck"),
        )
        .groupBy("from_nation", "to_nation")
        .agg(F.sum(rev_c).alias("c"))
    )
    lo = F.least("from_nation", "to_nation")
    hi = F.greatest("from_nation", "to_nation")
    out_flow = F.when(F.col("from_nation") == lo, F.col("c")).otherwise(0)
    in_flow = F.when(F.col("from_nation") == hi, F.col("c")).otherwise(0)
    net = F.when(F.col("from_nation") == lo, F.col("c")).otherwise(-F.col("c"))
    return (
        flows.filter(F.col("from_nation") != F.col("to_nation"))
        .groupBy(lo.alias("nation_a"), hi.alias("nation_b"))
        .agg(
            (F.sum(out_flow).cast("double") / 100.0).alias("a_to_b"),
            (F.sum(in_flow).cast("double") / 100.0).alias("b_to_a"),
            (F.sum(net).cast("double") / 100.0).alias("net_a"),
        )
        .orderBy("nation_a", "nation_b")
    )
