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
