"""Distributed global ranking — exact rank / percent_rank / cume_dist /
ntile over a total order WITHOUT a single-task global window.

A naive ``Window.orderBy(...)`` with no partitionBy collapses the whole
dataset into ONE task — the same scale-killer the brute-force ANN
ranking had before its two-stage fix (see operators/similarity.py). The
classic distributed answer, implemented here:

1. ``repartitionByRange`` on the order key — one shuffle, parallelism
   preserved, partition i holds keys strictly below partition i+1;
2. ``sortWithinPartitions`` + an Arrow-batched ``mapInPandas`` running
   counter for partition-local ranks (per-partition imperative logic is
   exactly the mapInPandas case — no extra shuffle, order preserved);
3. per-partition row counts → prefix-sum offsets. The counts are
   O(#partitions) driver-held metadata (like the K-Means centroid
   state), broadcast-joined back; global rank = local rank + offset.

Distribution stats then derive from the rank by exact integer formulas
(SQL-standard semantics under a TOTAL order — callers must append a
tie-breaker column; with a unique ORDER BY, percent_rank/cume_dist have
no peer groups and ntile is a pure function of (rank, n, k)).

Cost: two passes over the range exchange (counts pass + ranked pass) —
the price of exactness; at 100 TB both passes are scan+shuffle-local
with parallelism = #partitions throughout, vs the naive window's
parallelism of 1. (AQE note: advisory partition coalescing can merge
range partitions, but ranks only depend on partition ORDER, not
boundaries, so the result is plan-stable.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _with_local_ranks(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Range-partition + in-partition sort + running-counter local rank.
    Adds `_pid` (physical partition id) and `_local_rank` (1-based)."""
    arranged = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(arranged.schema.fields)
        + [T.StructField("_local_rank", T.LongType(), False)]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_local_rank"] = range(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    return arranged.mapInPandas(number, schema=out_schema)


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) as a pure function of the 1-based rank
    under a total order: the first n % k buckets get floor(n/k)+1 rows,
    the rest floor(n/k). Integer arithmetic only — oracle-exact."""
    big = n % k
    small = n // k
    cut = big * (small + 1)
    first = F.floor((rank - 1) / F.lit(small + 1)) + 1
    if small == 0:
        return first.cast("int")
    rest = F.lit(big) + F.floor((rank - 1 - cut) / F.lit(small)) + 1
    return F.when(rank <= cut, first).otherwise(rest).cast("int")


def global_distribution_ranks(
    df: DataFrame, order_cols: list[Column], ntile_k: int = 10
) -> DataFrame:
    """All input columns plus exact global `rank`, `pct_rank`,
    `cume`, and `bucket` (NTILE(ntile_k)) under the total order given
    by ``order_cols`` (must be unique — append a key column).

    Two actions: the counts pass collects O(#partitions) longs to the
    driver; the ranked pass is the returned DataFrame. The ranked
    DataFrame is localCheckpoint-ed (eager) BEFORE the counts pass so
    both actions read the SAME materialized range partitioning:
    ``repartitionByRange`` draws its bounds by reservoir sampling, and
    when the sample is partial (exactly the large-data regime) two
    independent executions can place rows in different `_pid`s, making
    the broadcast offsets wrong. Checkpointing pins one placement —
    a lost block raises instead of silently re-sampling.
    """
    ranked = _with_local_ranks(df, order_cols).localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranked.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    rank = F.col("_local_rank") + F.col("_offset")
    return (
        ranked.join(F.broadcast(off_df), "_pid")
        .select(
            *[c for c in df.columns],
            rank.alias("rank"),
            (
                (rank - 1).cast("double")
                / F.lit(float(max(n - 1, 1)))
            ).alias("pct_rank"),
            (rank.cast("double") / F.lit(float(n))).alias("cume"),
            ntile_from_rank(rank, n, ntile_k).alias("bucket"),
        )
    )
