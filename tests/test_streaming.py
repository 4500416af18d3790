"""Streaming/batch parity: the availableNow streaming run must equal the
batch twin on the same events data."""

from __future__ import annotations

from pyspark.sql import functions as F

from statcan_etl_pipeline_spark.catalog import load_table, table_path
from statcan_etl_pipeline_spark.operators.temporal import sessionize
from statcan_etl_pipeline_spark.registry import QUERIES
from statcan_etl_pipeline_spark.streaming.jobs import (
    events_stream,
    run_available_now,
    session_counts,
    windowed_counts,
)


def _stream_schema(spark, sf_dir):
    # File streams can't infer schema; reuse the batch reader's (and note
    # the nanos ts is already normalized by catalog.load_table, so stream
    # the RAW file with the raw schema and convert identically).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, "events")).schema


def _stage_dir(sf_dir: str) -> str:
    # file-stream sources need a DIRECTORY; stage the single parquet via symlink
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(d, "events.parquet"))
    return d


def _normalized_stream(spark, sf_dir):
    raw = events_stream(spark, _stage_dir(sf_dir), _stream_schema(spark, sf_dir))
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def test_windowed_counts_parity(spark, sf_small):
    stream = _normalized_stream(spark, sf_small)
    run_available_now(windowed_counts(stream), "stream_tumbling")
    got = {
        tuple(r)
        for r in spark.table("stream_tumbling")
        .select("bucket_start", "event_type", "n", "total_value")
        .collect()
    }
    want_df = QUERIES["events_tumbling_1h"](spark, sf_small)
    # batch twin renders bucket_start identically
    want = {tuple(r) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_session_window_matches_batch_sessionize(spark, sf_small):
    stream = _normalized_stream(spark, sf_small)
    run_available_now(session_counts(stream), "stream_sessions")
    stream_sessions = (
        spark.table("stream_sessions")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    ev = load_table(spark, sf_small, "events").select("user_id", "ts", "event_id")
    batch = (
        sessionize(ev, gap_seconds=1800, tiebreak=["event_id"])
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    got = {tuple(r) for r in stream_sessions.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_small):
    from statcan_etl_pipeline_spark.streaming.jobs import purchases_after_views_join

    stream = _normalized_stream(spark, sf_small)
    q = (
        purchases_after_views_join(stream)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("ss_join").collect()}

    ev = load_table(spark, sf_small, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        tuple(r)
        for r in purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") < F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select("purchase_id", "view_id", F.col("p_user").alias("user_id"))
        .collect()
    }
    assert got == want and len(got) > 0
