"""Snapshot-diff operator semantics on handwritten snapshots, plus the
skew-profile math against a by-hand computation."""

from __future__ import annotations

from hadoop_project_spark.operators.skew import key_skew_profile
from hadoop_project_spark.operators.snapshot import diff_summary, snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, None, None), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    rows = {
        r.k: r.status
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "changed",
        3: "changed",  # NULL moved columns — sentinel keeps them distinct
        4: "removed",
        5: "added",
    }


def test_null_layout_changes_hash(spark):
    # (NULL, "x") vs ("x", NULL) must differ; concat_ws would collapse
    old = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    [r] = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    assert r.status == "changed"


def test_diff_summary_counts(spark):
    old = spark.createDataFrame([(i, i % 7) for i in range(100)], "k long, v long")
    new = spark.createDataFrame(
        [(i, (i % 7) + (1 if i % 10 == 0 else 0)) for i in range(5, 105)],
        "k long, v long",
    )
    counts = {
        r.status: r.n_rows
        for r in diff_summary(snapshot_diff(old, new, ["k"], ["v"])).collect()
    }
    assert counts["removed"] == 5  # keys 0-4
    assert counts["added"] == 5  # keys 100-104
    changed = sum(1 for i in range(5, 100) if i % 10 == 0)
    assert counts["changed"] == changed
    assert counts["unchanged"] == 95 - changed


def test_skew_profile_math(spark):
    # key 0 -> 6 rows, keys 1..4 -> 1 row each
    df = spark.createDataFrame(
        [(0,)] * 6 + [(k,) for k in (1, 2, 3, 4)], "k long"
    )
    [r] = key_skew_profile(df, ["k"]).collect()
    assert (r.n_keys, r.n_rows, r.max_key_rows) == (5, 10, 6)
    assert r.avg_key_rows == 2.0
    assert r.p50_key_rows == 1.0
    assert r.max_share == 0.6
    assert r.skew_ratio == 3.0


def test_column_profile_nulls_and_bounds(spark):
    from hadoop_project_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1.0, "ab"), (2.5, None), (None, "wxyz"), (2.5, "ab")],
        "x double, s string",
    )
    rows = {r.column_name: r for r in column_profile(df, ["x"], ["s"]).collect()}
    x, s = rows["x"], rows["s"]
    assert (x.n_rows, x.n_nulls, x.n_distinct) == (4, 1, 2)
    assert (x.min_num, x.max_num) == (1.0, 2.5)
    assert x.min_len is None and x.max_len is None
    assert (s.n_nulls, s.n_distinct, s.min_len, s.max_len) == (1, 2, 2, 4)
    assert s.min_num is None
