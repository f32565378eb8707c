"""merge_upsert (operators/merge.py): resolution semantics, null
safety, and the audit column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_project_spark.operators.merge import merge_upsert


def _rows(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_matched_inserted_unchanged(spark):
    target = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k int, v int, tag string"
    )
    source = spark.createDataFrame(
        [(2, 200, "b2"), (3, 300, "c")], "k int, v int, tag string"
    )
    out = _rows(
        merge_upsert(target, source, keys=["k"], status_col="st")
    )
    assert out[1] == {"k": 1, "v": 10, "tag": "a", "st": "unchanged"}
    # source wins by default on matched rows
    assert out[2] == {"k": 2, "v": 200, "tag": "b2", "st": "updated"}
    assert out[3] == {"k": 3, "v": 300, "tag": "c", "st": "inserted"}


def test_additive_update_expression(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    source = spark.createDataFrame([(2, 5), (3, 7)], "k int, v int")
    out = _rows(
        merge_upsert(
            target, source, keys=["k"], updates={"v": lambda t, s: t + s}
        )
    )
    assert out[1]["v"] == 10  # kept
    assert out[2]["v"] == 25  # added
    assert out[3]["v"] == 7  # inserted takes source


def test_null_data_values_not_confused_with_absence(spark):
    """A NULL in a data column must not flip a row's merge status —
    presence is tracked by marker columns, not data nullability."""
    target = spark.createDataFrame([(1, None), (2, 20)], "k int, v int")
    source = spark.createDataFrame([(1, None), (3, None)], "k int, v int")
    out = _rows(merge_upsert(target, source, keys=["k"], status_col="st"))
    assert out[1]["st"] == "updated" and out[1]["v"] is None
    assert out[2]["st"] == "unchanged" and out[2]["v"] == 20
    assert out[3]["st"] == "inserted" and out[3]["v"] is None


def test_schema_mismatch_rejected(spark):
    target = spark.createDataFrame([(1, 10)], "k int, v int")
    source = spark.createDataFrame([(1, 10)], "k int, w int")
    with pytest.raises(ValueError, match="schemas must agree"):
        merge_upsert(target, source, keys=["k"])


def test_merge_is_one_shuffle_join(spark):
    """The physical plan is a single join keyed on the merge keys —
    no extra exchange beyond the two aggregate sides."""
    target = spark.createDataFrame([(1, 10)], "k int, v int")
    source = spark.createDataFrame([(2, 20)], "k int, v int")
    plan = (
        merge_upsert(target, source, keys=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Join") == 1
