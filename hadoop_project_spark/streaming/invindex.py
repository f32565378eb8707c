"""Incremental inverted-index maintenance over a document stream.

The index-directory row (operators/invindex.index_directory) is a
MERGEABLE aggregate as long as each document is ingested exactly once:
per-term df and cf ADD across disjoint batches, and the doc-id span
folds by min/max — so keeping a live index directory on an unbounded
ingest stream is the CDC merge pattern (streaming/merge.py), identical
in structure to the CM-sketch and histogram sinks: each micro-batch
reduces to one delta row per term it touches (vocabulary-of-the-batch
sized, Heaps-law sublinear), and foreachBatch merge-folds the delta
into the parquet state table with the same atomic staging-dir swap.

This is the ingest half of a search pipeline: the batch
`inverted_index_directory` query (plans/invindex_queries.py) is this
state's one-shot twin, and the driver hash-certifies it against a
position-exact oracle — so the stream≡batch equivalence test
(tests/test_streaming.py) ties the streaming component to a
CORRECTNESS-row relative, the same anchoring discipline as the LSH
ingest gate (dedup_gate.py).

At 100 TB/day: the state is O(vocabulary) rows regardless of stream
volume; the per-batch work is one widened scan + one partial-aggregated
groupBy + a vocabulary-keyed merge join. Replay safety: df/cf addition
is not idempotent on its own, so the merge sink records the applied
batch_id high-water mark inside the atomically-swapped state directory
and skips re-delivered batches — additive updates are effectively-once
(streaming/merge.py; crash-replay test in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_project_spark.operators.invindex import index_directory
from hadoop_project_spark.streaming.merge import make_merge_sink


def make_index_directory_sink(
    state_dir: str, app_id: str = "default"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining a live per-term index
    directory (term, df, cf, first_doc, last_doc) at ``state_dir``
    from a stream of documents (each doc in exactly one batch).
    ``app_id`` identifies the query+checkpoint lineage for the replay
    watermark (streaming/merge.py)."""

    def _prepare(batch: DataFrame) -> DataFrame:
        return index_directory(batch)

    def _add(old: Column, new: Column) -> Column:
        return old + new

    def _min(old: Column, new: Column) -> Column:
        return F.least(old, new)

    def _max(old: Column, new: Column) -> Column:
        return F.greatest(old, new)

    return make_merge_sink(
        state_dir,
        app_id=app_id,
        keys=["term"],
        updates={
            "df": _add,
            "cf": _add,
            "first_doc": _min,
            "last_doc": _max,
        },
        prepare=_prepare,
    )
