"""Structured Streaming jobs over the `events` stream shape.

Batch/stream parity by construction: the streaming aggregations reuse
the same column expressions as their batch twins
(queries/temporal.events_tumbling_1h, operators/temporal.sessionize),
so `availableNow` runs produce identical results to the batch query —
asserted in tests/test_streaming.py.

Scale notes: watermarks bound the state store (without one, windowed
state grows forever); `session_window` keeps session state per key and
evicts on watermark; sink is `memory` only in tests — production uses
kafka/parquet sinks with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import money_sum


def events_stream(spark: SparkSession, events_path: str, schema) -> DataFrame:
    """File-based stream of events (one file = one micro-batch source)."""
    return spark.readStream.schema(schema).parquet(events_path)


def windowed_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour counts/sums by event type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session aggregation with the state-store-backed
    `session_window` (the streaming twin of operators.temporal.sessionize)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("start_ts"), F.col("w.end").alias("end_ts"), "n_events")
    )


def purchases_after_views_join(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user views
    in the preceding hour. Watermarks on BOTH sides + the time-range
    predicate bound the join state (without them, stream-stream joins
    buffer forever)."""
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "view_id", F.col("p_user").alias("user_id"))


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain the whole source as a finite stream into an in-memory table
    named `query_name`, blocking until done.

    `output_mode` defaults to 'complete' (aggregation streams); pass
    'append' for non-aggregation streams (stream-stream joins) or
    'update' for applyInPandasWithState-style stateful operators —
    'complete' raises AnalysisException for those plans.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
