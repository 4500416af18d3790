"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user totals that survive across micro-batches — the
pattern for any custom accumulator Spark's built-in windowed aggs
can't express (per-key ML feature state, anomaly baselines, etc.).
State is a typed tuple in the state store, keyed by user; batches
arrive as Arrow-backed pandas frames, so the Python hop is vectorized.

Scale: state volume = O(distinct keys); use timeouts
(GroupStateTimeout.ProcessingTimeTimeout) to evict idle keys in
unbounded-key domains.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Cumulative (n_events, total_value) per user, updated every batch."""
    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
