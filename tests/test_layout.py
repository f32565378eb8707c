"""Z-order layout (sources/layout.py): measure multi-dimensional
pruning directly from the parquet footers — per-file min/max must tile
BOTH dimensions, so a mid-range predicate on either single column
overlaps only a minority of files, where a one-column sort layout
prunes on its sort column but overlaps (nearly) every file on the
other."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.sources.layout import write_zordered
from pyspark.sql import functions as F

QTY = ("l_quantity", 1.0, 50.0)
PRICE = ("l_extendedprice", 900.0, 105000.0)
N_FILES = 32


def _overlap_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet files whose [min, max] for `col` intersects
    [lo, hi] — exactly what a reader's file-level skip logic sees."""
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert files
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        fmin = min(
            md.row_group(i).column(
                md.schema.names.index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(
                md.schema.names.index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        if fmin <= hi and fmax >= lo:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(
        li,
        zpath,
        [(F.col(QTY[0]), QTY[1], QTY[2]), (F.col(PRICE[0]), PRICE[1], PRICE[2])],
        n_files=N_FILES,
    )
    # control: classic one-column sort layout (price-sorted)
    (
        li.repartitionByRange(N_FILES, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # mid-range predicates covering ~20% of each dimension
    # 32 files = 5 interleaved bits: 8 quantity strips x 4 price strips
    z_qty = _overlap_fraction(zpath, "l_quantity", 20.0, 30.0)
    z_price = _overlap_fraction(zpath, "l_extendedprice", 20000.0, 40000.0)
    s_qty = _overlap_fraction(spath, "l_quantity", 20.0, 30.0)
    s_price = _overlap_fraction(spath, "l_extendedprice", 20000.0, 40000.0)

    # the sorted layout prunes hard on its own column...
    assert s_price <= 0.35
    # ...but a predicate on the other column reads everything
    assert s_qty == 1.0
    # Z-order prunes on BOTH columns (strip resolution + boundary slack)
    assert z_qty <= 0.55
    assert z_price <= 0.75
    # and it beats the sorted layout's non-sort column by a wide margin
    assert z_qty + z_price < s_qty + s_price

    # and the layout is lossless
    assert (
        spark.read.parquet(zpath).count() == li.count()
    )
