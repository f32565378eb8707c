"""Incremental count-min sketch maintenance over a stream.

The CM sketch is a pure additive monoid — cell counts add — so the
streaming form is the CDC merge pattern (streaming/merge.py) with the
sketch build as the per-batch reducer: each micro-batch folds into at
most D x W delta rows (operators/sketch.cm_sketch), and foreachBatch
merge-adds them into the parquet state table. State size is bounded by
the grid (8 KiB of rows) no matter how much stream has passed — the
property that makes sketch-backed monitoring (hot keys, frequency
caps) viable on an unbounded 100 TB/day stream where exact per-key
state would grow without bound.

Replay safety comes from the CDC sink's staging-dir swap plus its
batch-id high-water mark (streaming/merge.py): a re-delivered batch is
detected and skipped, so the additive cell counts are effectively-once
without upstream dedup — crash-replay test in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_project_spark.operators.sketch import cm_sketch, hll_registers
from hadoop_project_spark.streaming.merge import make_merge_sink


def make_cm_sketch_sink(
    state_dir: str, key_col: str, app_id: str = "default"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining a CM sketch state table at
    ``state_dir`` from a stream of key occurrences."""

    def _prepare(batch: DataFrame) -> DataFrame:
        return cm_sketch(batch, key_col)

    def _add(old: Column, new: Column) -> Column:
        return old + new

    return make_merge_sink(
        state_dir,
        app_id=app_id,
        keys=["r", "col"],
        updates={"cnt": _add},
        prepare=_prepare,
    )


def make_hll_sink(
    state_dir: str, key_col: str, group_col: str, app_id: str = "default"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining per-group HyperLogLog registers
    at ``state_dir`` — the max-monoid twin of the CM sink for streaming
    DISTINCT counts (distinct users/tokens per key on an unbounded
    stream, where exact distinct state grows without bound but the
    register table stays ≤ groups × 2^HLL_P rows forever).

    Unlike the additive CM merge, max-merge is IDEMPOTENT: a replayed
    micro-batch re-maxes to the identical state, so foreachBatch's
    at-least-once delivery is exactly-once here with no upstream dedup
    needed. Read the estimate at any time with
    operators/sketch.hll_estimate over the state table.
    """

    def _prepare(batch: DataFrame) -> DataFrame:
        return hll_registers(batch, key_col, group_col)

    def _max(old: Column, new: Column) -> Column:
        return F.greatest(old, new)

    return make_merge_sink(
        state_dir,
        app_id=app_id,
        keys=["g", "idx"],
        updates={"M": _max},
        prepare=_prepare,
    )


def make_histogram_sink(
    state_dir: str,
    value_col: str,
    group_col: str,
    width: int,
    app_id: str = "default",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining a per-group fixed-grid
    histogram at ``state_dir`` — the additive-monoid streaming twin of
    plans/sketch_queries.price_quantile_histogram: each micro-batch
    folds to ≤ groups × buckets delta rows and merge-ADDS into the
    state, so bounded-error quantiles (one bucket width) are readable
    off the state table at any moment of an unbounded stream, where
    exact percentiles would need the full history.

    Like the CM sink, addition is not idempotent on its own — the merge
    sink's (app_id, batch_id) watermark supplies the replay skip
    (streaming/merge.py). ``value_col`` must already be the integer
    form (e.g. cents)."""

    def _prepare(batch: DataFrame) -> DataFrame:
        return (
            batch.select(
                F.col(group_col).alias("g"),
                F.floor(F.col(value_col) / F.lit(width)).alias("bucket"),
            )
            .groupBy("g", "bucket")
            .agg(F.count("*").alias("cnt"))
        )

    def _add(old: Column, new: Column) -> Column:
        return old + new

    return make_merge_sink(
        state_dir,
        app_id=app_id,
        keys=["g", "bucket"],
        updates={"cnt": _add},
        prepare=_prepare,
    )
