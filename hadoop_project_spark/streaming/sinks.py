"""Streaming sinks: effectively-once parquet output via foreachBatch.

Structured Streaming's file sink is append-only with its own log; real
pipelines usually need foreachBatch to (a) write a format/layout of
their choosing and (b) stay idempotent when a micro-batch is REPLAYED
after a failure (the at-least-once delivery every checkpointed stream
has). The standard pattern, implemented here without a table format:
each micro-batch overwrites its own `batch_id=N` partition directory —
a replay of batch N rewrites the identical directory instead of
appending duplicates, so downstream readers see each batch exactly
once. (With a transactional table format the same role is played by
MERGE keyed on batch_id; the shape of the sink function is identical.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Returns a foreachBatch function writing each micro-batch to
    ``{path}/batch_id={id}`` with overwrite semantics (replay-safe).

    Usage::

        q = (df.writeStream
               .foreachBatch(idempotent_parquet_sink(out))
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True)
               .start())
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{path}/batch_id={batch_id}")
        )

    return _sink
