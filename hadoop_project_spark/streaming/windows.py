"""Streaming twins of the batch event queries.

The reference has no streaming operator at all (verified in SURVEY.md
§2.8); these give the engine the readStream → window/watermark →
writeStream surface a pipeline at this scale needs:

* hourly_rollup_stream — the streaming twin of the registered
  `events_hourly_rollup` batch query: tumbling event-time window +
  watermark for late data. With the same input the streaming result in
  complete/append mode equals the batch result (asserted in
  tests/test_streaming.py).
* sessionize_stream — session windows (gap timeout) per user: the one
  shape the batch engine can't express incrementally.

At scale: state lives in the state store keyed by (window, type) /
(user, session); watermark bounds state size; shuffle is on the
aggregation key, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (parquet files
    appear → micro-batches). Schema is explicit: streaming sources
    never infer."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour count+sum per event type with late-data
    watermark. Output schema matches the batch `events_hourly_rollup`
    (hour, event_type, n_events, total_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "total_value")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a new session starts when a user is
    idle longer than ``gap``. Built on session_window — state is bounded
    by the watermark; no custom applyInPandasWithState needed for this
    shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
