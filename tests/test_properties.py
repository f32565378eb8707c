"""Hypothesis property tests (SURVEY.md §5 "property level"): engine
operators checked against independent pure-Python models on generated
inputs, not fixed fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_project_spark.functions.text import shingles_from_tokens
from hadoop_project_spark.operators.graph import connected_components
from hadoop_project_spark.operators.skew import salted_groupby_agg

_SETTINGS = dict(max_examples=6, deadline=None)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        max_size=12,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Label propagation must agree with a pure-Python union-find on
    arbitrary small graphs (self-loops and duplicates included)."""
    n = 10
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    # normalize: component id = min member
    comps: dict[int, int] = {}
    for i in range(n):
        root = find(i)
        comps.setdefault(root, min(j for j in range(n) if find(j) == root))
    expected = {i: comps[find(i)] for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "n long")
    edges_df = (
        spark.createDataFrame(edges, "a long, b long")
        if edges
        else spark.createDataFrame([], "a long, b long")
    )
    got = {
        r["n"]: r["component"]
        for r in connected_components(nodes, edges_df).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([1, 3, 16]),
)
def test_salted_agg_matches_direct(spark, rows, n_salts):
    """Salting is placement-only for any data and any salt count."""
    df = spark.createDataFrame(rows, "k string, v long")
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_groupby_agg(
            df,
            ["k"],
            [F.count("*").alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
            n_salts=n_salts,
        ).collect()
    }
    assert salted == direct


@settings(**_SETTINGS)
@given(
    toks=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), max_size=8
    ),
    k=st.sampled_from([1, 2, 3]),
)
def test_shingle_shape(spark, toks, k):
    """shingles_from_tokens: count == max(n-k+1, 1); every shingle joins
    exactly min(k, remaining) tokens; matches a pure-Python model."""
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    [row] = df.select(shingles_from_tokens(F.col("toks"), k).alias("s")).collect()
    got = row["s"]
    n = len(toks)
    expected = (
        [" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))]
        if n
        else [""]
    )
    # slice past the end takes what exists (SQL slice semantics)
    assert got == expected
