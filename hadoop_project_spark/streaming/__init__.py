"""Structured Streaming surface (SURVEY.md §2.8: the reference is pure
batch — this is the engine extension for the `events` stream table)."""

from hadoop_project_spark.streaming.windows import (  # noqa: F401
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)
