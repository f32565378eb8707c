"""K-Means property tests (SURVEY.md §5: K-Means e2e asserts
convergence properties + exact match vs a pure-Python/NumPy Lloyd
reference, since the reference repo's own goldens are unreproducible)."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    silhouette_score,
)

K, DIM, MAX_ITER, TOL = 4, 64, 6, 1e-3


def numpy_lloyd(X: np.ndarray, k: int, max_iter: int, tol: float):
    centroids = X[:k].astype(np.float64).copy()
    for it in range(1, max_iter + 1):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = np.stack(
            [
                X[assign == i].mean(axis=0) if (assign == i).any() else centroids[i]
                for i in range(k)
            ]
        )
        shift = np.abs(new - centroids).max()
        centroids = new
        if shift <= tol:
            return centroids, assign, it, True
    return centroids, assign, it, False


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").orderBy("vec_id")


def test_kmeans_matches_numpy_lloyd(spark, sf_dir, emb):
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    np_centroids, np_assign, np_iters, np_conv = numpy_lloyd(X, K, MAX_ITER, TOL)

    res = kmeans_fit(emb, k=K, dim=DIM, max_iter=MAX_ITER, tol=TOL)
    assert res.n_iters == np_iters
    assert res.converged == np_conv
    got = np.array(res.centroids)
    assert np.allclose(got, np_centroids, rtol=1e-8, atol=1e-10)

    assigned = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, res.centroids).collect()
    }
    # compare assignments under the FINAL centroids (numpy_lloyd's
    # returned assign is one update stale by construction)
    ids = [r["vec_id"] for r in rows]
    d = ((X[:, None, :] - np_centroids[None, :, :]) ** 2).sum(axis=2)
    final_assign = d.argmin(axis=1)
    mismatch = sum(assigned[vid] != a for vid, a in zip(ids, final_assign))
    assert mismatch == 0


def test_kmeans_inertia_monotone(spark, sf_dir, emb):
    """Lloyd guarantees non-increasing inertia between iterations."""
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    inertias = []
    centroids = X[:K].astype(np.float64).copy()
    for _ in range(4):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        inertias.append(d.min(axis=1).sum())
        assign = d.argmin(axis=1)
        centroids = np.stack(
            [
                X[assign == i].mean(axis=0) if (assign == i).any() else centroids[i]
                for i in range(K)
            ]
        )
    assert all(a >= b - 1e-9 for a, b in zip(inertias, inertias[1:]))


def test_inertia_history_populated_and_monotone(spark, sf_dir, emb):
    """The fit records one inertia per iteration, matching numpy's
    assignment-step inertia sequence and non-increasing per Lloyd."""
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    res = kmeans_fit(emb, k=K, dim=DIM, max_iter=MAX_ITER, tol=TOL)
    assert len(res.inertia_history) == res.n_iters
    assert all(
        a >= b - 1e-9
        for a, b in zip(res.inertia_history, res.inertia_history[1:])
    )
    # first-iteration inertia is the assignment cost under the init
    # centroids (k lowest-id points)
    d = ((X[:, None, :] - X[None, :K, :]) ** 2).sum(axis=2)
    assert abs(res.inertia_history[0] - d.min(axis=1).sum()) < 1e-6


def test_silhouette_in_range(spark, sf_dir, emb):
    res = kmeans_fit(emb, k=K, dim=DIM, max_iter=3, tol=TOL)
    s = silhouette_score(emb, res.centroids)
    # simplified silhouette (d2-d1)/d2 with d2>=d1>=0 lies in [0, 1]
    assert 0.0 <= s <= 1.0


# ---------------------------------------------------------------------------
# Pinned (fixed-point) fit: EXACT integer equality against a quantized
# NumPy Lloyd twin — the local pin behind the driver's chained-CTE
# oracle replay (plans/ml_queries.py).
# ---------------------------------------------------------------------------
def numpy_lloyd_pinned(Q: "np.ndarray", k: int, max_iter: int):
    """Python-int Lloyd on quantized coordinates, replicating
    kmeans_fit_pinned's exact recipe: integer squared distances, argmin
    ties to the lowest index, update floor(sum/n + 0.5) via one double
    division, empty cluster keeps its centroid, fixed-point early exit."""
    import math

    cents = [[int(x) for x in row] for row in Q[:k]]
    converged, it = False, 0
    for it in range(1, max_iter + 1):
        C = np.array(cents, dtype=np.int64)
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest index, same as Spark
        new = [list(c) for c in cents]
        for ci in range(k):
            members = Q[assign == ci]
            if len(members):
                sums = members.sum(axis=0)
                new[ci] = [
                    math.floor(int(s) / len(members) + 0.5) for s in sums
                ]
        if new == cents:
            converged = True
            break
        cents = new
    return cents, it, converged


def test_pinned_fit_matches_quantized_numpy_exactly(spark, sf_dir, emb):
    from hadoop_project_spark.operators.kmeans import (
        KM_QUANT,
        assign_clusters_pinned,
        kmeans_fit_pinned,
        quantize_points,
    )

    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = np.floor(X * KM_QUANT + 0.5).astype(np.int64)
    np_cents, np_iters, np_conv = numpy_lloyd_pinned(Q, K, 8)

    res = kmeans_fit_pinned(emb, k=K, dim=DIM, max_iter=8)
    assert res.centroids_q == np_cents  # exact integer equality
    assert res.n_iters == np_iters
    assert res.converged == np_conv

    # assignments under the final centroids match exactly too
    qpts = quantize_points(emb)
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in assign_clusters_pinned(qpts, res.centroids_q).collect()
    }
    C = np.array(np_cents, dtype=np.int64)
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    for vid, dists in zip((r["vec_id"] for r in rows), d):
        assert got[vid] == (int(dists.argmin()), int(dists.min()))


def test_quantization_is_exact_fixed_point(spark, sf_dir, emb):
    """floor(v·QUANT + 0.5) on the Spark side equals the same IEEE
    chain in NumPy for every fixture coordinate (negative values round
    half toward +inf on both)."""
    from hadoop_project_spark.operators.kmeans import KM_QUANT, quantize_points

    rows = emb.collect()
    got = {r["vec_id"]: r["qv"] for r in quantize_points(emb).collect()}
    for r in rows:
        expect = [
            int(np.floor(float(v) * KM_QUANT + 0.5)) for v in r["embedding"]
        ]
        assert got[r["vec_id"]] == expect


def test_pinned_fit_magnitude_guard_fails_loudly(spark):
    """VERDICT r8 item 7: coordinates big enough to break the int64
    squared-distance envelope must raise, not wrap/drift silently."""
    from pyspark.sql import Row

    from hadoop_project_spark.operators.kmeans import kmeans_fit_pinned

    big = 1.0e6  # quantizes to 1e10 ≫ the dim=2 bound of ~2^30
    pts = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[big, -big]),
            Row(vec_id=2, embedding=[-big, big]),
            Row(vec_id=3, embedding=[big / 2, big / 3]),
        ]
    )
    with pytest.raises(ValueError, match="squared-distance envelope"):
        kmeans_fit_pinned(pts, k=2, dim=2, max_iter=2)


def test_pinned_fit_guard_passes_on_unit_scale(spark):
    """The guard is a backstop, not a tax: unit-scale inputs (the
    documented |coord| < 1 envelope) fit without tripping it."""
    from pyspark.sql import Row

    from hadoop_project_spark.operators.kmeans import kmeans_fit_pinned

    pts = spark.createDataFrame(
        [Row(vec_id=i, embedding=[0.01 * i, -0.02 * i]) for i in range(8)]
    )
    res = kmeans_fit_pinned(pts, k=2, dim=2, max_iter=3)
    assert len(res.centroids_q) == 2
