"""Execution-shape helpers: decouple compute parallelism from input
split granularity.

A parquet file with one giant row group reads as ONE task no matter how
`spark.sql.files.maxPartitionBytes` slices it — byte splits land on the
row group's midpoint — so a CPU-heavy per-row transform downstream of
such a scan serializes on a single core. At 100 TB inputs have
thousands of row groups and this never happens; locally (and on any
badly-written upstream table) it silently wastes the whole executor.

`widen_for_compute` is the guard operators place BEFORE an expensive
per-row transform (n-gram materialization, hashing, codec work): if the
upstream already has at least the session's parallelism it is a no-op
(the cluster case — no shuffle added); only when splits are scarce does
it pay one small round-robin shuffle of the NARROW pre-transform rows
to regain the cores. Measured (sf1, single-row-group documents):
dedup_ngram_jaccard's gram stage 21.6 core-s on 1 effective task → the
same work on 32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_pin(df: DataFrame) -> DataFrame:
    """persist + BLOCKING materialization for a multi-consumer relation.

    A lazy persist loses when the first consuming job launches several
    stages concurrently (broadcast-exchange subqueries do exactly this):
    every stage starts computing the relation from source before any
    cache block exists, so the upstream runs N times (profiled at sf1:
    five identical 21.6 core-s stages under one query). The blocking
    count() forces the cache to fill in its own job first; every later
    stage then reads it.

    Deliberately persist-based, NOT localCheckpoint: checkpoint RDDs are
    invisible to spark.catalog.clearCache(), so a long-lived session
    (bench loop, CLI, notebook) accumulates them until driver GC +
    ContextCleaner get around to it — measured as a growing multi-second
    drag across a 142-query bench run. Cached relations are released
    deterministically by clearCache()/unpersist()."""
    out = df.persist()
    out.count()
    return out


def widen_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism IFF its
    current plan yields fewer partitions — a no-op exactly when input
    splits are plentiful (any real cluster table)."""
    if df.isStreaming:  # partitioning is the source's business there
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
