"""Kafka-shaped streaming source: reader construction + value parsing.

The parse step is a pure DataFrame→DataFrame function over the standard
Kafka record shape (key/value binary, topic, partition, offset,
timestamp), so it is fully unit-testable with a static DataFrame — no
broker or connector jar needed. `kafka_events_stream` wires the same
parser onto a real `format("kafka")` readStream on clusters that ship
the kafka connector (this container does not, by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def parse_kafka_events(
    records: DataFrame, value_schema: T.StructType = EVENTS_VALUE_SCHEMA
) -> DataFrame:
    """Kafka records → typed events rows.

    - `value` (binary) is UTF-8 JSON parsed with an EXPLICIT schema
      (from_json; no inference pass — malformed payloads become a NULL
      struct rather than failing the stream, surfaced via `is_malformed`
      for a downstream quarantine split).
    - Kafka's broker `timestamp` becomes the event time `ts` (use a
      payload field instead when producers embed one).
    - topic/partition/offset ride along — offset is the natural
      idempotency key for exactly-once sinks.
    """
    parsed = records.select(
        F.col("timestamp").alias("ts"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    )
    # from_json (PERMISSIVE) yields an ALL-NULL struct for unparseable
    # payloads, not a NULL struct — malformed = struct null OR every
    # declared field null
    all_null = None
    for f in value_schema.fieldNames():
        c = F.col(f"v.{f}").isNull()
        all_null = c if all_null is None else all_null & c
    return parsed.select(
        "ts",
        "topic",
        "partition",
        "offset",
        F.col("v.event_id").alias("event_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_type").alias("event_type"),
        F.col("v.value").alias("value"),
        F.col("v.props").alias("props"),
        (F.col("v").isNull() | all_null).alias("is_malformed"),
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    value_schema: T.StructType = EVENTS_VALUE_SCHEMA,
) -> DataFrame:
    """Streaming events off a Kafka topic (requires the
    spark-sql-kafka connector on the classpath; raises Spark's
    'Failed to find data source: kafka' otherwise)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_events(raw, value_schema)
