"""Streaming upsert maintenance: foreachBatch + MERGE into a parquet
state table.

The production CDC pattern — each micro-batch is reduced to a delta and
merged into the running state with operators/merge.merge_upsert (the
same full-outer resolution the batch path certifies via
merge_upsert_roundtrip). State is swapped atomically by directory
rename: the merged result is fully materialized into a staging dir
BEFORE the old state is replaced, so a crash mid-batch leaves the
previous state intact and the checkpointed source offsets simply replay
the batch (foreachBatch's at-least-once contract + idempotent merge =
effectively-once state).

On a real deployment the state table would be Delta/Iceberg and the
swap a transactional commit; the rename stands in for that commit with
the same read-modify-publish structure, and everything else (the merge
plan, the additive update expressions) transfers unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import Column, DataFrame

from hadoop_project_spark.operators.merge import merge_upsert


def make_merge_sink(
    state_dir: str,
    keys: list[str],
    updates: dict[str, Callable[[Column, Column], Column]],
    prepare: Callable[[DataFrame], DataFrame],
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function that maintains ``state_dir``.

    ``prepare`` reduces the raw micro-batch to one delta row per key
    (a pre-aggregation — keeps the merge join small); ``updates``
    resolves matched keys (additive for running aggregates).
    """
    staging = state_dir + ".staging"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = prepare(batch_df)
        if os.path.exists(state_dir):
            target = spark.read.parquet(state_dir)
            merged = merge_upsert(target, delta, keys=keys, updates=updates)
        else:
            merged = delta
        # materialize into staging BEFORE touching current state
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.replace(staging, state_dir)

    return sink
