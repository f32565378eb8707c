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
from hadoop_project_spark.functions.vector import (
    double_array_lit,
    squared_l2_distance,
)
from hadoop_project_spark.operators import similarity as sim
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

# Seeded literal centroids for the ORACLE-ANCHORED single-step queries
# below (distinct seed from the IVF coarse quantizer so the two query
# families can't mask each other's regressions).
STEP_SEED = 11

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


# ---------------------------------------------------------------------------
# Oracle-anchored single-step K-Means queries. The convergence LOOP is
# legitimately oracle-less (driver-side iteration), but one Lloyd step is
# pure SQL: literal seeded centroids (same byte-reproducible trick as the
# IVF coarse quantizer, operators/similarity.py make_coarse_centroids),
# argmin assignment, weighted-mean recompute. These hash-anchor the math
# of A11 (per-cluster weighted mean, KMeans.java:178-205), O3 (argmin),
# J3 (broadcast-by-literal centroids), F9 (squared L2), and — via the
# top-2 twin below — O4/F13 (Silhouette.java:83-95) under the driver's
# value-hash check instead of leaving them tests-only.
# ---------------------------------------------------------------------------
def _step_cents() -> list[list[float]]:
    return sim.make_coarse_centroids(KM_K, KM_DIM, STEP_SEED)


def _step_dists(cents: list[list[float]]):
    """array<double> of 9dp-rounded squared L2 distances to each literal
    centroid — rounding makes argmin/sort decisions identical across
    engines (same strategy as the IVF cell assignment)."""
    carr = double_array_lit(cents)
    return F.transform(
        carr, lambda c: F.round(squared_l2_distance("embedding", c), 9)
    )


def _sql_step_ds(cents: list[list[float]]) -> str:
    """DuckDB twin of _step_dists as a literal list expression."""

    def sqdist(cent: list[float]) -> str:
        lits = ", ".join(repr(x) for x in cent)
        return (
            f"round(list_sum([(CAST(embedding[i] AS DOUBLE) - ([{lits}])[i]) * "
            f"(CAST(embedding[i] AS DOUBLE) - ([{lits}])[i]) "
            f"for i in range(1, {KM_DIM + 1})]), 9)"
        )

    return "[" + ", ".join(sqdist(c) for c in cents) + "]"


@register(
    "kmeans_assign_step",
    priority=10,
    oracle=f"""
    WITH keyed AS (
      SELECT embedding, {_sql_step_ds(_step_cents())} AS ds FROM embeddings
    ),
    assigned AS (
      SELECT embedding,
             CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cluster
      FROM keyed
    ),
    ex AS (
      SELECT cluster, CAST(u.i AS INT) AS pos,
             CAST(embedding[u.i + 1] AS DOUBLE) AS v
      FROM assigned, (SELECT UNNEST(range(0, {KM_DIM})) AS i) u
    )
    SELECT cluster, pos, round(AVG(v), 6) AS val,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM ex GROUP BY cluster, pos
    """,
    tags=("ml", "kmeans", "A11", "O3", "J3", "F9"),
)
def kmeans_assign_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd step under the driver's hash check: argmin
    assignment to seeded literal centroids, then the per-(cluster, dim)
    mean recompute (A11's sum(x)/n), 6dp-rounded like the reference's
    centroid output. Ties break to the lowest cluster index on both
    engines (array_position / list_position both find the first min)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ds = _step_dists(_step_cents())
    cluster = (F.array_position(ds, F.array_min(ds)) - 1).cast("int")
    assigned = emb.select(cluster.alias("cluster"), "embedding")
    return (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("val"),
            F.count("*").cast("long").alias("n_points"),
        )
    )


@register(
    "nearest_two_centroids",
    priority=10,
    oracle=f"""
    WITH keyed AS (
      SELECT {_sql_step_ds(_step_cents())} AS ds FROM embeddings
    ),
    two AS (
      SELECT list_sort([[ds[i], CAST(i - 1 AS DOUBLE)]
                        for i in range(1, {KM_K + 1})])[:2] AS t
      FROM keyed
    ),
    scored AS (
      SELECT CAST(t[1][2] AS INT) AS nearest, CAST(t[2][2] AS INT) AS second,
             t[1][1] AS d1, t[2][1] AS d2,
             CASE WHEN t[2][1] > 0 THEN (t[2][1] - t[1][1]) / t[2][1]
                  ELSE 0.0 END AS sil
      FROM two
    )
    SELECT nearest, second, CAST(COUNT(*) AS BIGINT) AS n_points,
           round(AVG(d1), 6) AS avg_d1, round(AVG(d2), 6) AS avg_d2,
           round(AVG(sil), 6) AS avg_silhouette
    FROM scored GROUP BY nearest, second
    """,
    tags=("ml", "kmeans", "O4", "F13"),
)
def nearest_two_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4's top-2 min under the driver's hash check: per point, the two
    nearest seeded literal centroids (sorted (dist, idx) pairs — ties to
    the lower index on both engines), aggregated per (nearest, second)
    cell with the reference's simplified silhouette (d2-d1)/d2 on
    squared distances (Silhouette.java:83-95, bug-compat form)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ds = _step_dists(_step_cents())
    pairs = F.transform(
        ds, lambda d, i: F.struct(d.alias("d"), i.cast("double").alias("i"))
    )
    two = F.slice(F.array_sort(pairs), 1, 2)
    scored = emb.select(
        two[0]["i"].cast("int").alias("nearest"),
        two[1]["i"].cast("int").alias("second"),
        two[0]["d"].alias("d1"),
        two[1]["d"].alias("d2"),
    ).withColumn(
        "sil",
        F.when(
            F.col("d2") > 0, (F.col("d2") - F.col("d1")) / F.col("d2")
        ).otherwise(F.lit(0.0)),
    )
    return scored.groupBy("nearest", "second").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.avg("d1"), 6).alias("avg_d1"),
        F.round(F.avg("d2"), 6).alias("avg_d2"),
        F.round(F.avg("sil"), 6).alias("avg_silhouette"),
    )
