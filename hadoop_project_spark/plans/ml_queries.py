"""Iterative ML queries — the reference's K-Means pipeline
(final/src/main/java/program/KDriver.java) on the embeddings table.

These are genuinely non-SQL-expressible (driver-side convergence loop),
so they carry no oracle (driver records the weaker rows-only check);
tests/test_kmeans.py pins them against a pure-NumPy Lloyd reference and
asserts the reference pipeline's convergence properties instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    silhouette_score,
)
from hadoop_project_spark.plans.registry import register

KM_K = 8
KM_DIM = 64
KM_MAX_ITER = 8
KM_TOL = 1e-3

# One Lloyd fit is shared by every query over the same (sf_dir, k): the
# result is a plain k×dim Python list independent of the SparkSession,
# and refitting per query (two full convergence loops per bench run)
# would buy nothing. The key folds in a cheap data fingerprint
# (count + sum(crc32(vec_id)), one aggregate scan) so a regenerated
# fixture under the same path invalidates the cache instead of
# silently serving a stale fit — the kmeans queries are the only
# rows-only-checked ones, so a stale fit would otherwise be invisible.
_FIT_CACHE: dict[tuple[str, int, int, int], object] = {}


def _data_fingerprint(emb: DataFrame) -> tuple[int, int]:
    row = emb.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.crc32(F.col("vec_id").cast("string"))), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _shared_fit(
    emb: DataFrame, sf_dir: str, k: int = KM_K, assume_cached: bool = False
):
    n, h = _data_fingerprint(emb)
    key = (sf_dir, k, n, h)
    if key not in _FIT_CACHE:
        _FIT_CACHE[key] = kmeans_fit(
            emb, k=k, dim=KM_DIM, max_iter=KM_MAX_ITER, tol=KM_TOL,
            assume_cached=assume_cached,
        )
    return _FIT_CACHE[key]


@register(
    "kmeans_centroids",
    priority=900,
    oracle=None,
    tags=("ml", "kmeans", "A11", "J3", "O3", "C2"),
)
def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final centroids of k=8 Lloyd iterations on the embeddings, as
    (cluster, pos, val) rows rounded to 6 dp (F11's HALF_UP rounding,
    generalized from the reference's 3-dp lat/lon)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = _shared_fit(emb, sf_dir)
    rows = [
        (ci, pos, float(v))
        for ci, c in enumerate(res.centroids)
        for pos, v in enumerate(c)
    ]
    df = spark.createDataFrame(rows, "cluster int, pos int, val double")
    return df.select("cluster", "pos", F.round("val", 6).alias("val"))


@register(
    "kmeans_cluster_sizes",
    priority=900,
    oracle=None,
    tags=("ml", "kmeans", "A9", "O3"),
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cardinalities + mean within-cluster squared distance after
    convergence (the reference's PickUpData count rollup, A9, in vector
    space)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = _shared_fit(emb, sf_dir)
    assigned = assign_clusters(emb, res.centroids)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_points"),
        F.round(F.avg("dist"), 6).alias("avg_sq_dist"),
    )


@register(
    "kmeans_silhouette",
    priority=900,
    oracle=None,
    tags=("ml", "kmeans", "A12", "F13", "C1"),
)
def kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection sweep (KDriver.java:60-63): fit k ∈ {4, 8}, score
    each with the reference's simplified silhouette ((d2-d1)/d2 on
    squared distances), return one row per k — the engine analog of
    KResults.txt."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    try:
        rows = []
        for k in (4, 8):
            # the k=8 fit is the same (data, init, params) model that
            # kmeans_centroids/_cluster_sizes use — share it; emb is
            # already cached here, don't let the fit cache a second copy
            res = _shared_fit(emb, sf_dir, k, assume_cached=True)
            s = silhouette_score(emb, res.centroids)
            rows.append((k, round(s, 6), res.n_iters, res.converged))
    finally:
        emb.unpersist()
    return spark.createDataFrame(
        rows, "k int, silhouette double, n_iters int, converged boolean"
    )
