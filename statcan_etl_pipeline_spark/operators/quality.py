"""Data-quality validation: dbt-test-style checks compiled to ONE
Spark job.

Each check is a (name, violation-count) pair; `dq_report` unions them
into a single report DataFrame. Counts aggregate before the union, so
the whole report is a handful of scans Catalyst can schedule together
— not one job per check.

Supported checks: not_null, unique, accepted_values, referential
(orphan foreign keys), range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return df.filter(F.col(col).isNull()).agg(
        F.lit(name or f"not_null:{col}").alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    return dups.agg(
        F.lit(name or f"unique:{','.join(cols)}").alias("check_name"),
        F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).cast("long").alias("violations"),
    )


def check_accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    return df.filter(~F.col(col).isin(values) | F.col(col).isNull()).agg(
        F.lit(name or f"accepted_values:{col}").alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def check_referential(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str,
    name: str | None = None,
) -> DataFrame:
    orphans = child.join(
        parent.select(F.col(parent_key).alias("__pk")),
        child[child_key] == F.col("__pk"),
        "left_anti",
    )
    return orphans.agg(
        F.lit(name or f"referential:{child_key}->{parent_key}").alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def check_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    return df.filter((F.col(col) < lo) | (F.col(col) > hi)).agg(
        F.lit(name or f"range:{col}").alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def check_freshness(
    df: DataFrame,
    ts_col: str,
    as_of: str,
    max_lag_seconds: int,
    name: str | None = None,
) -> DataFrame:
    """Freshness: the newest ``ts_col`` must be within ``max_lag_seconds``
    of ``as_of`` (an ISO timestamp string — pass your pipeline's run
    time). Reports 1 violation if stale or the table is empty, else 0.
    The staple check for incremental loads: catches a silently dead
    upstream BEFORE downstream queries serve old data."""
    lag = F.unix_timestamp(F.lit(as_of).cast("timestamp")) - F.unix_timestamp(
        F.max(F.col(ts_col))
    )
    return df.agg(
        F.lit(name or f"freshness:{ts_col}").alias("check_name"),
        F.when(
            F.coalesce(lag, F.lit(max_lag_seconds + 1)) > max_lag_seconds, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("violations"),
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


def observed_metrics(df: DataFrame, name: str = "dq"):  # -> (DataFrame, Observation)
    """Attach Spark's `observe()` instrumentation: row count, null
    counts for every column, and min/max for numeric columns are
    collected AS the job runs — zero extra passes over the data (the
    separate-aggregate DQ checks each cost a scan; this piggybacks on
    whatever action the caller already executes). Read the metrics from
    the returned Observation after an action completes."""
    from pyspark.sql import Observation
    from pyspark.sql.types import NumericType

    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for f in df.schema.fields:
        exprs.append(
            F.sum(F.when(F.col(f.name).isNull(), 1).otherwise(0)).alias(
                f"nulls__{f.name}"
            )
        )
        # NumericType covers byte/short/int/long/float/double/decimal —
        # a typeName allowlist silently skipped byte and decimal columns
        if isinstance(f.dataType, NumericType):
            exprs.append(F.min(f.name).alias(f"min__{f.name}"))
            exprs.append(F.max(f.name).alias(f"max__{f.name}"))
    obs = Observation(name)
    return df.observe(obs, *exprs), obs
