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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x): the successor API —
# composable typed state (ValueState/ListState/MapState), timers, and
# state TTL, replacing the single-tuple state of
# applyInPandasWithState. Same job as above (per-user running totals)
# so the two APIs can be parity-checked against each other and against
# the batch aggregate. Requires the RocksDB state store provider AND
# google.protobuf in the Python env (the state-server protocol) — the
# parity test skips itself where protobuf is absent (this sandbox),
# mirroring the multimodal codec guard.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class UserTotalsProcessor(StatefulProcessor):
    """ValueState-backed cumulative (n_events, total_value) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, total double"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def tws_user_totals(stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas flavor of stateful_user_totals."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
