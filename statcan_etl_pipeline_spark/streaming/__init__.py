"""Structured Streaming jobs: watermarked windows, session windows,
stream-stream joins, bounded-state dedup, foreachBatch merge, and the
applyInPandasWithState stateful operator."""

from .jobs import (
    deduped_stream,
    events_stream,
    purchases_after_views_join,
    read_merge_target,
    run_available_now,
    run_foreach_batch_upsert,
    session_counts,
    windowed_counts,
)
from .stateful import stateful_user_totals

__all__ = [
    "deduped_stream",
    "events_stream",
    "purchases_after_views_join",
    "read_merge_target",
    "run_available_now",
    "run_foreach_batch_upsert",
    "session_counts",
    "stateful_user_totals",
    "windowed_counts",
]
