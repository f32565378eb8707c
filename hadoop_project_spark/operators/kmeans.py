"""K-Means over an array<float> embedding column — the reference's
`final` project (final/src/main/java/calc/KMeans.java) re-architected
for Spark, generalized from 2-D lat/lon to n-dim vectors.

Reference → Spark mapping (SURVEY.md §3.3):
  * centroids in HBase, re-read per task per iteration
    (KMeans.java:75-82, 365-378)           → driver-held Python list,
    embedded as a broadcast-sized literal array in the plan;
  * one full MR job per iteration (~40 s setup each, the reference's
    own identified bottleneck)             → one cached DataFrame, one
    short Spark action per iteration;
  * assignment shuffle by cluster idx
    (KMeans.java:119-151)                  → groupBy on (cluster, dim)
    after posexplode, partial-aggregated map-side;
  * convergence test via two HBase scans
    (KMeans.java:294-314)                  → pure-Python comparison of
    two driver-held lists (tol on max coordinate shift).

Assignment is argmin over an array of (dist, idx) structs — array_min
orders lexicographically, so ties break to the lowest cluster index,
deterministically. All math is JVM-side; no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from hadoop_project_spark.functions.vector import (
    double_array_lit,
    squared_l2_distance,
)


@dataclass
class KMeansResult:
    centroids: list[list[float]]  # k × dim
    n_iters: int
    converged: bool
    inertia_history: list[float]


def _centroid_array(centroids: list[list[float]]):
    """Single nested-array literal (array<array<double>>) of the current
    centroids — the Spark analog of the reference's per-task centroid
    cache (broadcast by value inside the serialized plan; tiny).

    Built via one expr-string parse (functions/vector.double_array_lit):
    per-element py4j F.lit conversion cost 450 ms per 8×64 literal —
    dominating every Lloyd iteration's plan build — vs 0.8 ms for the
    parse; Catalyst constant-folds the parsed CreateArray tree into the
    same single ArrayData Literal, so analysis/codegen stay O(1) in
    k×dim exactly as before (values verified bit-identical)."""
    return double_array_lit(centroids)


def assign_clusters(
    points: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add `cluster` (argmin squared-L2 centroid index) and `dist`
    columns. Pure projection — no shuffle. Ties break to the lowest
    cluster index (array_position finds the first occurrence of the
    minimum, which is bitwise-identical to the min it just computed)."""
    vecs = _centroid_array(centroids)
    scored = F.transform(vecs, lambda v: squared_l2_distance(vec_col, v))
    best = F.array_min(scored)
    cluster = (F.array_position(scored, best) - 1).cast("int")
    return points.withColumn("cluster", cluster).withColumn("dist", best)


def update_centroids(
    assigned: DataFrame, k: int, dim: int, vec_col: str = "embedding",
    weight_col: str | None = None,
) -> tuple[list[list[float]], list[int], float]:
    """New centroids = per-cluster per-dimension (weighted) mean —
    A11's sum(x·w)/sum(w) (KMeans.java:178-205) via posexplode +
    groupBy(cluster, dim): one shuffle of (k × dim) partial aggregates,
    never the raw points.

    Also returns the weighted inertia of the assignment that produced
    ``assigned`` (sum of w·dist). After posexplode each point's dist
    repeats once per dimension, so summing dist·w alongside the per-dim
    sums and dividing by dim recovers it with zero extra actions.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    per_dim = (
        assigned.select(
            "cluster", w.alias("w"), "dist", F.posexplode(vec_col).alias("pos", "val")
        )
        .groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("val").cast("double") * F.col("w")).alias("s"),
            F.sum("w").alias("n"),
            F.sum(F.col("dist") * F.col("w")).alias("d"),
        )
        .collect()
    )
    sums = [[0.0] * dim for _ in range(k)]
    counts = [0] * k
    for row in per_dim:
        sums[row["cluster"]][row["pos"]] = row["s"] / row["n"]
        counts[row["cluster"]] = row["n"]
    inertia = sum(row["d"] for row in per_dim) / dim
    return sums, counts, inertia


def kmeans_fit(
    points: DataFrame,
    k: int,
    dim: int,
    max_iter: int = 20,
    tol: float = 1e-3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assume_cached: bool = False,
) -> KMeansResult:
    """Lloyd's algorithm with deterministic init (the k lowest-id points
    — unlike the reference's unseeded Random, CGenerator.java:99, this
    reproduces bit-for-bit across runs).

    The points DataFrame is cached once; each iteration is one narrow
    assignment projection + one (k×dim)-row aggregation action — the
    entire per-iteration MR job + HBase round-trip of the reference
    collapsed into a sub-second action. A model-selection sweep passes
    ``assume_cached=True`` with an externally cached DataFrame so the
    k fits share one materialization.
    """
    if not assume_cached:
        points = points.select(id_col, vec_col).cache()
    try:
        init_rows = points.orderBy(id_col).limit(k).collect()
        centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

        inertia_hist: list[float] = []
        converged = False
        it = 0
        for it in range(1, max_iter + 1):
            assigned = assign_clusters(points, centroids, vec_col)
            new_centroids, counts, inertia = update_centroids(assigned, k, dim, vec_col)
            inertia_hist.append(inertia)
            # empty cluster: keep previous centroid (reference keeps the
            # row absent; keeping the old centroid is the standard fix)
            for i in range(k):
                if counts[i] == 0:
                    new_centroids[i] = centroids[i]
            shift = max(
                max(abs(a - b) for a, b in zip(ca, cb))
                for ca, cb in zip(centroids, new_centroids)
            )
            centroids = new_centroids
            if shift <= tol:
                converged = True
                break
        return KMeansResult(centroids, it, converged, inertia_hist)
    finally:
        # every iteration's action has run; holding the cache past the
        # fit only leaks executor memory across repeated fits (the
        # model-selection sweep calls this once per k)
        if not assume_cached:
            points.unpersist()


def silhouette_score(
    points: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> float:
    """The reference's *simplified* silhouette (documented bug-compat,
    SURVEY.md §7.3): per point, (d2 - d1) / d2 on SQUARED distances to
    the nearest / second-nearest centroid (Silhouette.java:83-97), not
    the textbook formula — then the global average."""
    vecs = _centroid_array(centroids)
    dists = F.array_sort(
        F.transform(vecs, lambda v: squared_l2_distance(vec_col, v))
    )
    score = F.when(
        dists[1] > 0, (dists[1] - dists[0]) / dists[1]
    ).otherwise(F.lit(0.0))
    row = points.select(F.avg(score).alias("s")).first()
    return float(row["s"])
