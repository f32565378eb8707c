"""connected_components on synthetic topologies (operators/graph.py) —
shapes the documents corpus can't guarantee: long chains (iteration
depth), stars, isolated nodes, everything-connected."""

from __future__ import annotations

from hadoop_project_spark.operators.graph import connected_components


def _cc(spark, n_nodes, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "n long")
    edges = (
        spark.createDataFrame(edge_list, "a long, b long")
        if edge_list
        else spark.createDataFrame([], "a long, b long")
    )
    out = connected_components(nodes, edges)
    comp = {r["n"]: r["component"] for r in out.collect()}
    out.unpersist()
    return comp


def test_chain_collapses_to_min(spark):
    """A 12-node chain needs multiple propagation rounds; all nodes must
    end at label 0."""
    comp = _cc(spark, 12, [(i, i + 1) for i in range(11)])
    assert set(comp.values()) == {0}


def test_two_components_and_isolated(spark):
    comp = _cc(spark, 7, [(1, 2), (2, 3), (5, 6)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[0] == 0 and comp[4] == 4  # singletons


def test_star_single_round(spark):
    comp = _cc(spark, 6, [(0, i) for i in range(1, 6)])
    assert set(comp.values()) == {0}


def test_edge_orientation_irrelevant(spark):
    a = _cc(spark, 4, [(3, 2), (2, 1), (1, 0)])
    b = _cc(spark, 4, [(0, 1), (1, 2), (2, 3)])
    assert a == b == {i: 0 for i in range(4)}


def test_no_edges_all_singletons(spark):
    comp = _cc(spark, 5, [])
    assert comp == {i: i for i in range(5)}


def test_cc_shuffle_regime_matches_broadcast_regime(spark):
    """Round-12: the per-iteration label joins broadcast the label side
    when the nodes plan is provably small and fall back to the generic
    shuffle joins otherwise. Force the generic path (threshold -1) and
    assert identical components on a topology needing several rounds."""
    chain = [(i, i + 1) for i in range(11)] + [(20, 21), (21, 22)]
    base = _cc(spark, 23, chain)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert _cc(spark, 23, chain) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert {base[n] for n in range(12)} == {0}
    assert base[20] == base[21] == base[22] == 20


def test_run_overlapped_order_and_errors():
    """run_overlapped returns results in input order and propagates the
    first exception after every thunk finishes."""
    import time

    from hadoop_project_spark.execution import run_overlapped

    def slow():
        time.sleep(0.05)
        return "slow"

    assert run_overlapped([slow, lambda: "fast"]) == ["slow", "fast"]
    assert run_overlapped([lambda: 1]) == [1]

    def boom():
        raise RuntimeError("boom")

    try:
        run_overlapped([slow, boom])
    except RuntimeError as e:
        assert "boom" in str(e)
    else:  # pragma: no cover
        raise AssertionError("exception swallowed")


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented count vs pure-Python enumeration on a graph with
    a hub, two disjoint triangles, a 4-clique, and isolated chains."""
    import itertools

    from hadoop_project_spark.operators.graph import triangle_count

    raw = (
        [(0, 1), (1, 2), (0, 2)]          # triangle
        + [(3, 4), (4, 5), (3, 5)]        # triangle
        + [(6, 7), (7, 8)]                # chain, no triangle
        + list(itertools.combinations([10, 11, 12, 13], 2))  # 4-clique: 4 triangles
        + [(0, 9), (1, 9)]                # extra triangle via 9
    )
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    df = spark.createDataFrame(edges, "a int, b int")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == expected == 7
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)


def test_canonical_by_quality_picks_best_member(spark, monkeypatch):
    """dedup_canonical_by_quality keeps the highest-quality doc per
    cluster (ties -> lowest doc_id), exercised on a crafted corpus where
    the best copy is NOT the lowest id."""
    from hadoop_project_spark.plans import dedup_queries as dq

    # same cyclic phrase at two lengths: identical DISTINCT bigram
    # shingle sets (Jaccard 1.0) but the longer doc 1 earns the higher
    # length credit -> higher quality; plus an unrelated singleton
    rows = [
        (0, "the spark table scan fast " * 10),
        (1, "the spark table scan fast " * 20),
        (2, "completely different unrelated words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        "hadoop_project_spark.catalog.load_table",
        lambda s, d, n: docs,
    )
    monkeypatch.setattr(
        dq, "load_table", lambda s, d, n: docs
    )
    out = dq.dedup_canonical_by_quality(spark, "unused").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["component"] == by_id[1]["component"]
    assert by_id[0]["cluster_size"] == 2
    # doc 1 has the higher stopword density -> higher quality -> canonical
    assert by_id[1]["quality_score"] > by_id[0]["quality_score"]
    assert by_id[1]["is_canonical"] and not by_id[0]["is_canonical"]
    assert by_id[2]["is_canonical"] and by_id[2]["cluster_size"] == 1
