"""Salted aggregation / join equivalence: salting must change placement
only, never results (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators.skew import (
    salted_broadcast_left,
    salted_groupby_agg,
    with_salt,
)


def test_salted_groupby_equals_direct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    direct = (
        l.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
    )
    salted = salted_groupby_agg(
        l,
        keys=["l_returnflag"],
        partial_aggs=[
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        ],
        merge_aggs=[F.sum("n").alias("n"), F.sum("q").alias("q")],
        n_salts=16,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_equals_direct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    ).select("o_custkey", "c_mktsegment")
    direct = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_broadcast_left(orders, cust, on="o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_outer_preserves_unmatched(spark, sf_dir):
    """Left-outer salted join keeps fact rows with no dim match exactly
    once (the failure mode a naive salting gets wrong: an unmatched row
    must not appear n_salts times)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # dim restricted to half the customers so some orders miss
    dim = (
        cust.filter(F.col("c_custkey") % 2 == 0)
        .withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_mktsegment")
    )
    direct = orders.join(dim, "o_custkey", "left")
    salted = salted_broadcast_left(orders, dim, on="o_custkey", n_salts=8, how="left")
    assert salted.count() == direct.count()
    assert (
        salted.filter(F.col("c_mktsegment").isNull()).count()
        == direct.filter(F.col("c_mktsegment").isNull()).count()
    )


def test_salt_range(spark, sf_dir):
    l = with_salt(load_table(spark, sf_dir, "lineitem"), 16)
    rng = l.agg(F.min("_salt"), F.max("_salt")).first()
    assert rng[0] >= 0 and rng[1] <= 15


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's first line of defense against hot keys (SCALING.md)
    must actually fire: a join with one key holding ~1/3 of all rows,
    executed under AQE with test-scale thresholds, finishes with
    SortMergeJoin(skew=true) in the final adaptive plan — runtime
    partition splitting, no salting needed. The salting operators in
    operators/skew.py cover the cases AQE can't (hot GROUP BY state,
    per-key broadcast)."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
        ).unionByName(
            spark.range(0, 100000).select(
                F.lit(7).alias("k"), F.col("id").alias("payload")
            )
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        j = left.join(right, "k").agg(F.count("*").alias("n"))
        [row] = j.collect()
        assert row.n == 300000  # semantics unchanged by the split
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
