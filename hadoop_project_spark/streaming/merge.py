"""Streaming upsert maintenance: foreachBatch + MERGE into a parquet
state table.

The production CDC pattern — each micro-batch is reduced to a delta and
merged into the running state with operators/merge.merge_upsert (the
same full-outer resolution the batch path certifies via
merge_upsert_roundtrip). State is published by directory rename with a
rollback backup: the merged result is fully materialized into a staging
dir, the current state is renamed aside, the staging dir takes its
place, and only then is the backup removed — at every instant either
the state dir or its backup holds a complete previous state, so a crash
at ANY point leaves a recoverable full copy (the sink restores the
backup on its next entry and the checkpointed source offsets replay the
batch).

Exactly-once for ADDITIVE updates (VERDICT r8 #3): re-merging a
replayed batch would double-count df/cf/sketch cells, so the sink
records (app_id, last applied batch_id) in a marker file INSIDE the
state directory (underscore-prefixed — Spark's parquet reader ignores
it) and skips any batch at or below the high-water mark. The marker
rides the same rename publish as the data, so state and mark can never
disagree. foreachBatch's at-least-once delivery + this idempotence =
effectively-once state, for additive folds too, not just idempotent
upserts.

The app_id guards the OTHER replay hazard: batch_ids restart from 0
when a query is given a fresh checkpoint, so an old high-water mark
would silently swallow the first N batches of the new run. A sink
whose app_id does not match the state's recorded one raises instead of
guessing — exactly Delta's (txnAppId, txnVersion) dedup contract,
which this marker models; the operator either keeps the checkpoint or
resets the state dir.

On a real deployment the state table would be Delta/Iceberg and the
publish a transactional commit carrying the same watermark; the rename
stands in for that commit with the same read-modify-publish structure,
and everything else (the merge plan, the additive update expressions)
transfers unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import Column, DataFrame

from hadoop_project_spark.operators.merge import merge_upsert

_BATCH_MARKER = "_last_batch_id"
DEFAULT_APP_ID = "default"


def _read_marker(state_dir: str) -> tuple[str, int] | None:
    try:
        with open(os.path.join(state_dir, _BATCH_MARKER)) as fh:
            lines = fh.read().splitlines()
        if len(lines) == 1:  # pre-app-id marker (round-9 interim format)
            return DEFAULT_APP_ID, int(lines[0])
        return lines[0], int(lines[1])
    except (OSError, ValueError, IndexError):
        return None


def last_applied_batch(
    state_dir: str, app_id: str = DEFAULT_APP_ID
) -> int | None:
    """The high-water batch_id recorded in ``state_dir`` for this
    streaming app, or None if the state predates the marker / doesn't
    exist. Raises on an app_id mismatch — see the module docstring."""
    mark = _read_marker(state_dir)
    if mark is None:
        return None
    rec_app, batch = mark
    if rec_app != app_id:
        raise RuntimeError(
            f"state dir {state_dir!r} was written by streaming app "
            f"{rec_app!r}; merging batches from app {app_id!r} (a fresh "
            f"checkpoint restarts batch_ids at 0) would double-count the "
            f"additive state — pass the same app_id or reset the state dir"
        )
    return batch


def make_merge_sink(
    state_dir: str,
    keys: list[str],
    updates: dict[str, Callable[[Column, Column], Column]],
    prepare: Callable[[DataFrame], DataFrame],
    app_id: str = DEFAULT_APP_ID,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function that maintains ``state_dir``.

    ``prepare`` reduces the raw micro-batch to one delta row per key
    (a pre-aggregation — keeps the merge join small); ``updates``
    resolves matched keys (additive for running aggregates).
    ``app_id`` identifies the streaming query+checkpoint lineage —
    replays within it (batch_id ≤ the recorded high-water mark) are
    skipped; a different lineage against the same state raises.
    """
    staging = state_dir + ".staging"
    backup = state_dir + ".old"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # crash recovery: if a previous publish renamed the state aside
        # and died before completing, roll back to the full backup copy
        # (the half-published batch replays on top of it)
        if not os.path.exists(state_dir) and os.path.exists(backup):
            os.rename(backup, state_dir)
        applied = last_applied_batch(state_dir, app_id)
        if applied is not None and batch_id <= applied:
            return  # crash-replay of an already-merged batch: no-op
        delta = prepare(batch_df)
        if os.path.exists(state_dir):
            target = spark.read.parquet(state_dir)
            merged = merge_upsert(target, delta, keys=keys, updates=updates)
        else:
            merged = delta
        # materialize into staging BEFORE touching current state; the
        # (app_id, batch_id) marker joins the same publish
        merged.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, _BATCH_MARKER), "w") as fh:
            fh.write(f"{app_id}\n{batch_id}")
        # publish: state -> backup, staging -> state, drop backup. A
        # full previous state survives every crash point in between.
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(state_dir):
            os.rename(state_dir, backup)
        os.replace(staging, state_dir)
        shutil.rmtree(backup, ignore_errors=True)

    return sink
