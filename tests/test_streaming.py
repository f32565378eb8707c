"""Streaming ≡ batch equivalence: run the streaming rollup over the
static events table (availableNow) and compare against the registered
batch query."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.streaming.windows import (
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)


def _events_as_parquet_dir(spark, sf_dir, tmp_path):
    """The raw testdata file is TIMESTAMP(NANOS) which the streaming
    reader can't take directly; rewrite via the catalog (micros)."""
    out = str(tmp_path / "events_stream_src")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_streaming_rollup_equals_batch(spark, sf_dir, tmp_path):
    src = _events_as_parquet_dir(spark, sf_dir, tmp_path)
    stream = read_events_stream(spark, src)
    rollup = hourly_rollup_stream(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("hourly_rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from hourly_rollup_test").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
    )
    exp = {(r["hour"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}
    assert got == exp
    shutil.rmtree(src, ignore_errors=True)


def test_sessionization_stream(spark, sf_dir, tmp_path):
    src = _events_as_parquet_dir(spark, sf_dir, tmp_path)
    stream = read_events_stream(spark, src)
    sessions = sessionize_stream(stream, gap="30 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions_test").collect()
    assert len(rows) > 0
    # session invariants: end >= start, counts positive, no overlapping
    # sessions per user
    by_user = {}
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 >= e1
    shutil.rmtree(src, ignore_errors=True)
