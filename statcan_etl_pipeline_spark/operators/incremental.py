"""Incremental-load operators: upsert (merge) and SCD2 history.

An ETL pipeline's load side needs: apply a batch of corrections to a
snapshot ("latest wins"), and keep dimension history as validity
ranges. Both are single-shuffle window formulations — no MERGE
statement or transactional table format needed (swap in Delta/Iceberg
MERGE INTO on clusters that have it; the semantics here are identical).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge: rows from `updates` replace same-key rows in
    `base`; unmatched update rows are inserts. One shuffle on the key.
    If `order_col` is given it breaks ties among multiple updates for
    the same key (highest wins)."""
    keys = list(keys)
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    order = [F.desc("__src")] + ([F.desc(order_col)] if order_col else [])
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    open_end_value: str = "9999-12-31",
) -> DataFrame:
    """Type-2 slowly-changing history: each (key, effective_date) version
    gets [valid_from, valid_to) where valid_to is the next version's
    effective date (open-ended for the current version)."""
    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(effective_col)
    nxt = F.lead(effective_col).over(w)
    return df.withColumn("valid_from", F.col(effective_col)).withColumn(
        "valid_to", F.coalesce(nxt, F.lit(open_end_value))
    )
