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
* probes between compactions read base ∪ LIVE segments (read_segments
  skips segments at or below the compaction watermark — the postings
  schema is identical, so every *_over probe works on the union
  unchanged);
* a periodic COMPACTION folds base + live segments into the bucketed
  base table (operators/invindex.write_index_tables — the SAME write
  path the one-shot build uses) and then advances the watermark,
  RETIRING the folded segments from the serving union; it is O(index)
  but amortized over many batches, exactly Lucene's merge / Delta's
  OPTIMIZE cadence, and re-running a half-finished compaction is
  self-healing (see compact_segments' crash contract).

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
    index_table_names,
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


_COMPACTED_MARKER = "_compacted_through"


def compacted_through(seg_root: str) -> int:
    """Highest batch_id already folded into the base by a completed
    compaction, or -1 if none. Segments at or below it are RETIRED:
    read_segments skips them, so the serving union (base ∪ live
    segments) never double-counts a folded posting."""
    try:
        with open(os.path.join(seg_root, _COMPACTED_MARKER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


def _published_segments(seg_root: str) -> list[tuple[int, str]]:
    if not os.path.isdir(seg_root):
        raise ValueError(f"no published segments under {seg_root}")
    out = []
    for d in os.listdir(seg_root):
        if d.startswith(_SEG_PREFIX) and not d.endswith(".staging"):
            out.append((int(d[len(_SEG_PREFIX):]), os.path.join(seg_root, d)))
    return sorted(out)


def read_segments(
    spark: SparkSession, seg_root: str, include_retired: bool = False
) -> DataFrame:
    """LIVE (not-yet-compacted) segments as one postings relation
    (term, doc_id, pos) — the interim probe target (base ∪ segments).
    Staging dirs are excluded by construction; segments at or below the
    compaction watermark are retired unless ``include_retired``."""
    floor = -1 if include_retired else compacted_through(seg_root)
    segs = [p for bid, p in _published_segments(seg_root) if bid > floor]
    if not segs:
        raise ValueError(f"no published segments under {seg_root}")
    return spark.read.parquet(*segs)


def compact_segments(
    spark: SparkSession,
    seg_root: str,
    prefix: str,
    n_buckets: int = POSTINGS_BUCKETS,
) -> tuple[str, str]:
    """Fold the live segments (and any existing base) into the
    term-bucketed serving tables — Lucene merge / Delta OPTIMIZE for
    this index — then advance the compaction watermark so the folded
    segments retire from the serving union. Returns the table names.

    Crash contract: the watermark is written (atomic temp + rename)
    only AFTER the base tables land, so a crash mid-compaction leaves
    yesterday's watermark and the folded-but-unretired segments serve
    twice only until compaction re-runs — and re-running is SELF-
    HEALING because (term, doc_id, pos) is a primary key: the base ∪
    segments union is deduplicated by DISTINCT before the rewrite, so
    a posting present in both the half-published base and its segment
    folds back to one row."""
    live = read_segments(spark, seg_root)
    pt = index_table_names(prefix)[0]
    hi = max(bid for bid, _ in _published_segments(seg_root))
    tmp_dir = os.path.join(seg_root, "_compact_input.tmp")
    if spark.catalog.tableExists(pt):
        # the rewrite drops the base table it reads from — spill the
        # deduplicated union to a temp dir first (the compact_parquet
        # overwrite-via-temp discipline), never write-while-reading
        (
            spark.table(pt)
            .select("term", "doc_id", "pos")
            .unionByName(live)
            .distinct()
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        live = spark.read.parquet(tmp_dir)
    names = write_index_tables(live, prefix, n_buckets)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    tmp = os.path.join(seg_root, _COMPACTED_MARKER + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(str(hi))
    os.replace(tmp, os.path.join(seg_root, _COMPACTED_MARKER))
    return names
