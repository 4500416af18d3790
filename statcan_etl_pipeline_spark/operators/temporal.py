"""Temporal / ordered operators: as-of join, sessionization, tumbling windows.

Spark has no built-in as-of join; the classic MPP-friendly formulation
is union-the-sides + carry-forward-last-match inside a keyed window.
That costs ONE shuffle on (key) and a per-partition sort — the same
cost profile as a sort-merge join, and it never materializes the O(n·m)
inequality-join intermediate. At 100 TB this is the difference between
"runs" and "doesn't".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of).

    Right rows at the exact left timestamp DO match. Ties among right
    rows at the same timestamp resolve to the greatest right row
    (struct-lexicographic) — deterministic.
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]

    rsel = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in [right_ts, *rcols]]).alias("__rv"),
    )
    null_rv = F.lit(None).cast(rsel.schema["__rv"].dataType)
    lsel = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        null_rv.alias("__rv"),
        *[F.col(c) for c in lcols],
    )
    rsel = rsel.select(*on, "__ts", "__src", "__rv", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols])

    unioned = lsel.unionByName(rsel)
    w = (
        W.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__src"), F.asc_nulls_first("__rv"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last("__rv", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("__match", carried)
        .filter(F.col("__src") == 1)
        .select(
            *on,
            F.col("__ts").alias(left_ts),
            *[F.col(c) for c in lcols],
            F.col(f"__match.{right_ts}").alias(f"{right_prefix}{right_ts}"),
            *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in rcols],
        )
    )
    return out


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``. Adds a
    1-based ``session_id`` per key. Gap math is integer microseconds —
    portable across engines (no float truncation ambiguity)."""
    w = W.partitionBy(key).orderBy(ts, *tiebreak)
    # cast: unix_micros rejects TIMESTAMP_NTZ (Spark 4 parquet default);
    # with session TZ = UTC the cast is value-preserving and a no-op on
    # already-TIMESTAMP input
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )


def tumbling_window(df: DataFrame, ts: str, duration: str = "1 hour") -> Column:
    """Epoch-aligned tumbling window start for grouping (batch parity of
    the Structured Streaming `window()` aggregation)."""
    return F.window(F.col(ts), duration)["start"]


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts >= left_ts`` within the same ``on`` key (forward as-of —
    pandas merge_asof(direction='forward') semantics).

    Right rows at the exact left timestamp DO match. Ties among right
    rows at the same timestamp resolve to the smallest right row
    (struct-lexicographic) — deterministic. Same single-shuffle
    union + carry formulation as the backward variant (no inequality
    join blowup).
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]

    rsel = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in [right_ts, *rcols]]).alias("__rv"),
    )
    null_rv = F.lit(None).cast(rsel.schema["__rv"].dataType)
    lsel = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        null_rv.alias("__rv"),
        *[F.col(c) for c in lcols],
    )
    rsel = rsel.select(
        *on,
        "__ts",
        "__src",
        "__rv",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    unioned = lsel.unionByName(rsel)
    # left rows (src=1) sort BEFORE same-ts right rows (src=0) so the
    # [current, +inf) frame sees exact-timestamp matches
    w = (
        W.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.desc("__src"), F.asc_nulls_first("__rv"))
        .rowsBetween(0, W.unboundedFollowing)
    )
    carried = F.first("__rv", ignorenulls=True).over(w)
    return (
        unioned.withColumn("__match", carried)
        .filter(F.col("__src") == 1)
        .select(
            *on,
            F.col("__ts").alias(left_ts),
            *[F.col(c) for c in lcols],
            F.col(f"__match.{right_ts}").alias(f"{right_prefix}{right_ts}"),
            *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in rcols],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the CLOSEST right row in time within
    the same key (pandas merge_asof(direction='nearest')); exact ties
    prefer the backward (earlier-or-equal) match. Built from the
    backward and forward passes over one union — the two windows share
    the partitioning, so Catalyst plans one exchange + two sorts.

    Requires left rows to be unique on (on, left_ts, payload) — the
    back/forward recombination joins on those columns, so fully
    duplicated left rows would multiply. Dedupe first if needed."""
    on = list(on)
    back = asof_join_backward(left, right, on, left_ts, right_ts, "__b_").alias("b")
    fwd = asof_join_forward(left, right, on, left_ts, right_ts, "__f_").alias("f")
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    join_keys = on + [left_ts] + lcols
    # null-SAFE equality on every recombination key: a NULL payload
    # column must not drop the left row (plain = would)
    cond = None
    for c in join_keys:
        eq = F.col(f"b.{c}").eqNullSafe(F.col(f"f.{c}"))
        cond = eq if cond is None else cond & eq
    both = back.join(fwd, cond)
    b_ts, f_ts = F.col(f"b.__b_{right_ts}"), F.col(f"f.__f_{right_ts}")
    # microsecond precision: whole-second unix_timestamp would misrank
    # sub-second gaps (and the events testdata carries nanos); cast
    # guards against TIMESTAMP_NTZ input (Spark 4 parquet default)
    lt_us = F.unix_micros(F.col(f"b.{left_ts}").cast("timestamp"))
    take_back = F.when(b_ts.isNull(), F.lit(False)).otherwise(
        f_ts.isNull()
        | (
            lt_us - F.unix_micros(b_ts.cast("timestamp"))
            <= F.unix_micros(f_ts.cast("timestamp")) - lt_us
        )
    )
    sel = [F.col(f"b.{c}").alias(c) for c in join_keys]
    sel.append(
        F.when(take_back, b_ts).otherwise(f_ts).alias(f"{right_prefix}{right_ts}")
    )
    for c in rcols:
        sel.append(
            F.when(take_back, F.col(f"b.__b_{c}"))
            .otherwise(F.col(f"f.__f_{c}"))
            .alias(f"{right_prefix}{c}")
        )
    return both.select(*sel)
