"""LSM-style ingest for the STORED inverted index: per-batch postings
segments + compaction into the term-bucketed serving table.

operators/invindex.build_index_tables writes the serving layout (the
term-bucketed, bucket-sorted postings table round 9 materialized); an
unbounded document stream cannot rewrite that layout per micro-batch —
a bucketed saveAsTable is O(index), not O(batch). The production shape
is the log-structured one every search/OLAP ingest pipeline converges
on (Lucene segments, LSM memtables → SSTables, Delta OPTIMIZE):

* each micro-batch appends ONE immutable postings SEGMENT — batch-sized
  work, an atomic directory publish, naturally idempotent under replay
  because the segment is named by its batch_id (a re-delivered batch
  sees its segment already published and skips — the same
  exactly-once-by-watermark argument as streaming/merge.py, with the
  directory name as the mark);
* probes between compactions read base ∪ segments (read_segments —
  the postings schema is identical, so every *_over probe works on the
  union unchanged);
* a periodic COMPACTION folds all segments into the bucketed base
  table (operators/invindex.write_index_tables — the SAME write path
  the one-shot build uses), restoring bucket-local probes; it is
  O(index) but amortized over many batches, exactly Lucene's merge /
  Delta's OPTIMIZE cadence.

At 100 TB/day: segment writes are embarrassingly parallel and never
touch the base table; compaction is one repartition-by-term write whose
cost the round-9 roundtrip queries measure (SCALING.md r9 family). The
live index-DIRECTORY (df/cf per term) is maintained incrementally by
streaming/invindex.py independent of segment compaction cadence.

The stream≡batch equivalence (segment-ingested + compacted index
answers phrase/BM25 probes identically to the one-shot build, which the
driver hash-certifies via `inverted_index_build_roundtrip` /
`bm25_topk_stored`) is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_project_spark.operators.invindex import (
    POSTINGS_BUCKETS,
    postings,
    write_index_tables,
)

_SEG_PREFIX = "seg_"


def segment_dir(seg_root: str, batch_id: int) -> str:
    return os.path.join(seg_root, f"{_SEG_PREFIX}{batch_id:012d}")


def make_postings_segment_sink(
    seg_root: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function appending one immutable postings segment
    per micro-batch under ``seg_root``.

    Idempotent under replay: the segment directory is named by
    batch_id and published by atomic rename AFTER the parquet write
    completes into a staging dir — a re-delivered batch finds its
    segment already published and skips; a crash mid-write leaves only
    a staging dir the next attempt overwrites."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        final = segment_dir(seg_root, batch_id)
        if os.path.exists(final):
            return  # replayed batch: segment already published
        staging = final + ".staging"
        postings(batch_df).write.mode("overwrite").parquet(staging)
        os.makedirs(seg_root, exist_ok=True)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(staging, final)

    return sink


def read_segments(spark: SparkSession, seg_root: str) -> DataFrame:
    """All published segments as one postings relation (term, doc_id,
    pos) — the interim probe target (base ∪ segments) and the
    compaction input. Staging dirs are excluded by construction (their
    suffix never matches the published name)."""
    segs = sorted(
        os.path.join(seg_root, d)
        for d in os.listdir(seg_root)
        if d.startswith(_SEG_PREFIX) and not d.endswith(".staging")
    )
    if not segs:
        raise ValueError(f"no published segments under {seg_root}")
    return spark.read.parquet(*segs)


def compact_segments(
    spark: SparkSession,
    seg_root: str,
    prefix: str,
    n_buckets: int = POSTINGS_BUCKETS,
) -> tuple[str, str]:
    """Fold every published segment into the term-bucketed serving
    tables (the SAME layout and write path as the one-shot build) —
    Lucene merge / Delta OPTIMIZE for this index. Returns the table
    names. Each document must live in exactly one segment (the sink
    above guarantees it per-batch); compaction itself is a pure
    repartition-by-term rewrite, safe to re-run."""
    return write_index_tables(read_segments(spark, seg_root), prefix, n_buckets)
