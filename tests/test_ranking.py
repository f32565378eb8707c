"""Distributed global ranking (operators/ranking.py) must reproduce
the naive single-task global window exactly — checked here on crafted
data and edge cases; the DuckDB window functions serve as the oracle in
tests/test_oracle_parity.py[customer_value_deciles]."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window, functions as F

from hadoop_project_spark.operators.ranking import (
    global_distribution_ranks,
    ntile_from_rank,
)


def _naive(df, order_cols, k):
    w = Window.orderBy(*order_cols)
    return df.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(k).over(w).alias("bucket"),
    )


@pytest.mark.parametrize("n,k", [(97, 10), (100, 10), (7, 10), (1, 10)])
def test_matches_naive_global_window(spark, n, k):
    # values collide heavily so range partitions split value runs;
    # (val, id) is the unique total order
    df = spark.createDataFrame(
        [Row(id=i, val=(i * 37) % 13) for i in range(n)]
    )
    order = [F.col("val"), F.col("id")]
    got = {
        r.id: r for r in global_distribution_ranks(df, order, k).collect()
    }
    want = {r.id: r for r in _naive(df, order, k).collect()}
    assert set(got) == set(want)
    for i in got:
        g, w = got[i], want[i]
        assert (g.rank, g.bucket) == (w.rank, w.bucket), i
        assert g.pct_rank == w.pct_rank and g.cume == w.cume, i


def test_parallelism_preserved(spark):
    """The whole point: the ranked plan must not funnel through a
    single-partition global sort (no SinglePartition exchange)."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("val")
    )
    ranked = global_distribution_ranks(df, [F.col("val"), F.col("id")])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    # AQE may coalesce the tiny test shuffle, but the PLAN must never
    # demand a single partition (what Window.orderBy would do)
    assert "SinglePartition" not in plan


def test_ntile_formula_all_shapes(spark):
    # every (n, k) shape in a small grid matches Spark's own ntile
    for n, k in [(10, 3), (11, 3), (12, 3), (3, 5), (5, 5)]:
        df = spark.createDataFrame([Row(id=i) for i in range(n)])
        naive = {
            r.id: r.b
            for r in df.select(
                "id", F.ntile(k).over(Window.orderBy("id")).alias("b")
            ).collect()
        }
        formula = {
            r.id: r.b
            for r in df.select(
                "id",
                ntile_from_rank(F.col("id") + 1, n, k).alias("b"),
            ).collect()
        }
        assert formula == naive, (n, k)
