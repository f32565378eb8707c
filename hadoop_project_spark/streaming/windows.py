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


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (parquet files
    appear → micro-batches). Schema is explicit: streaming sources
    never infer. ``max_files_per_trigger`` bounds each micro-batch —
    the backpressure knob, and the way tests force a multi-batch run
    over static input."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


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


def sliding_rollup_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows: each event lands in window/slide
    overlapping windows (4 at the defaults). State per (window, type)
    key; watermark expires windows whose end precedes it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
        )
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total, emitted once per micro-batch per
    updated user.

    This is the shape session_window/window can't express — arbitrary
    user-defined state carried across micro-batches (the engine's
    stand-in for custom incremental operators like feature accumulators
    or fraud counters). State is one tiny struct per user in the state
    store; the shuffle is the groupBy on user_id, same as batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small)
    static dimension — Spark broadcasts the static side per batch. The
    standard enrichment shape (events × user/device/geo dims)."""
    return events.join(F.broadcast(dim), on, "left")


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


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: drop repeat deliveries of the same event
    within the watermark horizon (the at-least-once → effectively-once
    bridge every ingest pipeline needs; dedup state per key is expired
    by the watermark so it stays bounded).

    Default key is event_id — the natural idempotency key of the
    events table.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def purchases_after_clicks_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding ``horizon``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store holds only ``watermark + horizon`` of
    either stream per user — the condition every production
    stream-stream join needs to avoid unbounded buffering.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_value",
        "click_id",
        "c_ts",
        "p_ts",
    )


IDLE_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

IDLE_SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def idle_finalized_sessions_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 second"
) -> DataFrame:
    """CLOSED sessions only, via applyInPandasWithState with an
    EVENT-TIME timeout — the state-store feature none of the other
    streaming ops exercise.

    A session closes two ways: inline, when the same user's next event
    arrives more than ``gap_minutes`` later (emitted immediately,
    regardless of watermark); or by timeout, when the watermark passes
    last_event + gap with no successor — the state store fires the
    timed-out group, the stored session is emitted, and the state is
    removed. That second path is what separates this from the lag-based
    batch sessionization: an idle user's session finalizes WITHOUT
    waiting for their next visit, which is the semantics a
    session-driven downstream (billing, abandonment emails) actually
    needs. State per user is one 3-long struct; the shuffle is the
    groupBy on user_id.

    Batches must arrive in event-time order per user for the inline
    split decision (the usual log-ingestion contract; the watermark
    bounds the disorder the pipeline tolerates).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        # state carries MICROsecond epochs (full event precision); only
        # the timeout registration rounds (up) to the store's ms grain
        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "session_end": [pd.to_datetime(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return
        rows = [pdf for pdf in pdf_iter if len(pdf)]
        if not rows:
            # all-empty invocation (contract edge across Spark versions):
            # keep any live session's timeout armed and emit nothing
            if state.exists:
                _, last_us, _ = state.get
                state.setTimeoutTimestamp(-(-(last_us + gap_us) // 1_000))
            return
        ts_us = pd.concat(rows)["ts"].sort_values().astype("int64") // 1_000
        cur = state.get if state.exists else None
        for t in ts_us:
            t = int(t)
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                yield emit(*cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], t, cur[2] + 1)
        state.update(cur)
        state.setTimeoutTimestamp(-(-(cur[1] + gap_us) // 1_000))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=IDLE_SESSION_OUTPUT_SCHEMA,
            stateStructType=IDLE_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
