"""Join utilities for skewed keys.

A shuffle join on a power-law key (one user = 20% of events) makes one
reducer the straggler. `salted_join` explodes the SMALL side into
`salt` replicas and scatters the big side's hot rows uniformly across
them — the hot key's work spreads over `salt` reducers. AQE's skew-join
handles moderate skew automatically; salting is the explicit tool for
the pathological cases you know about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `key` with `salt`-way salting.
    Result columns = big's columns + small's non-key columns.

    Only `inner` and `left` joins are supported: the small side is
    exploded into `salt` replicas, so a right/full outer join would
    emit each unmatched small-side row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "the small side is replicated salt times, so right/full outer "
            "would duplicate unmatched small-side rows"
        )
    big_salted = big.withColumn(
        "__salt_b", (F.abs(F.hash(F.monotonically_increasing_id())) % salt).cast("int")
    )
    small_salted = small.withColumn(
        "__salt_s", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    ).withColumnRenamed(key, "__rkey")
    out = big_salted.join(
        small_salted,
        (F.col(key) == F.col("__rkey")) & (F.col("__salt_b") == F.col("__salt_s")),
        how,
    )
    return out.drop("__salt_b", "__salt_s", "__rkey")
