"""Multi-dimensional data layout: Z-order (Morton) clustering.

A single-column sort gives parquet min/max pruning on that column only
— a range predicate on any OTHER column overlaps every file. Z-order
interleaves the bits of several columns into one sort key so files
cover small hyper-rectangles of the value space, and range predicates
on EACH participating column skip most files/row-groups
(tests/test_layout.py measures the footer min/max overlap directly).

At 100 TB this is the physical-design lever the partitioned/bucketed
sinks (sources/sinks.py) don't cover: partitioning handles one
low-cardinality column, bucketing handles one join key, Z-order
handles multi-dimensional range workloads (time × user, lat × lon,
quantity × price). The write is one range-repartition on the computed
key plus an in-partition sort — the same cost as any global layout
rewrite, typically amortized by a nightly compaction pass.

The Morton key is built from pure built-in bit arithmetic (floor /
shiftright / bitwiseAND — all inside WholeStageCodegen), so computing
it adds no Python boundary to the write path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(
    cols: list[tuple[Column, float, float]], bits: int = 16
) -> Column:
    """Morton key interleaving ``bits`` bits per column.

    Each (column, lo, hi) is min-max scaled to [0, 2^bits) with
    clamping, then bit b of column i lands at interleaved position
    b * n_cols + (n_cols - 1 - i). Bounds are caller-supplied constants
    (table stats); values outside clamp to the edge cell, which only
    weakens pruning locally, never correctness.
    """
    top = (1 << bits) - 1
    units = []
    for c, lo, hi in cols:
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(
            float(hi - lo)
        ) * F.lit(float(top))
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(top)))
        units.append(F.floor(clamped).cast("long"))
    n = len(units)
    terms = []
    for i, u in enumerate(units):
        for b in range(bits):
            pos = b * n + (n - 1 - i)
            terms.append(
                F.shiftright(u, b).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
            )
    return reduce(lambda a, t: a + t, terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[tuple[Column, float, float]],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-repartition on the Morton key (so files tile the key space
    contiguously) + in-partition sort (so row groups tile it within
    each file), key dropped before write."""
    z = zorder_key(cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
