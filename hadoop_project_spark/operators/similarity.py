"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set, scan the corpus once, per-query window top-k. At 100 TB the
  corpus side stays partition-parallel with zero shuffle of the corpus;
  only the (n_queries × k) result shuffles.
* lsh_topk — random-hyperplane LSH: bucket corpus and queries by the
  sign-bit key of H fixed hyperplanes, search only matching buckets
  (optionally multi-probe by also matching hamming-1 neighbor buckets).
  This is the scale path: bucket key is a shuffle key, so the work per
  query drops by ~2^H while recall stays tunable via H and probes.

All vector math is JVM-side (functions/vector.py) — zip_with/aggregate
inside whole-stage codegen; no Python per row. Hyperplanes are
deterministic (seeded Python RNG, embedded as literals) so results are
reproducible and oracle-checkable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hadoop_project_spark.functions.vector import cosine_similarity, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Returns (query_id, neighbor_id, cosine, rank) with deterministic
    neighbor_id tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("q_vec", "c_vec").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def make_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim. Plain
    Python RNG (public, stable algorithm) so both the Spark plan and any
    oracle can embed identical literals."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def lsh_bucket(vec_col: str, planes: list[list[float]]):
    """Bucket id = integer of sign bits of <vec, plane_i>."""
    key = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        key = bit if key is None else key + bit
    return key.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Single-table sign-bit LSH fails whenever a neighborhood straddles a
    hyperplane (the whole cluster splits across buckets), so — as in
    every production LSH — we build ``n_tables`` independent tables and
    union their candidates: a pair is missed only if it splits in EVERY
    table. ``multiprobe`` additionally probes all hamming-1 buckets per
    table, rescuing pairs that differ by exactly one borderline plane.

    Scale shape: corpus is bucketed by a scan-side expression (no
    shuffle until the join); (table, bucket) is the join key, so the
    per-query work is ~n_tables × (1 + n_planes) buckets instead of the
    full corpus; skewed buckets are AQE-split.
    """
    c_buckets = []
    q_probes = []
    for t in range(n_tables):
        planes = make_hyperplanes(n_planes, dim, seed + 1000 * t)
        bkt = lsh_bucket(vec_col, planes)
        c_buckets.append(F.struct(F.lit(t).alias("tbl"), bkt.alias("bucket")))
        probes = [bkt]
        if multiprobe:
            probes += [bkt.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        q_probes += [
            F.struct(F.lit(t).alias("tbl"), p.alias("bucket")) for p in probes
        ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(F.array(*c_buckets)).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.tbl", "tb.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.array(*q_probes)).alias("tb"),
    ).select("query_id", "q_vec", "tb.tbl", "tb.bucket")
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .distinct()
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("q_vec", "c_vec").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    min_cosine: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on ``block_col``
    (at scale the block key is an LSH bucket — see lsh_bucket; here the
    table's own label provides the deterministic blocking for the
    oracle-checkable variant)."""
    a = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col(block_col).alias("blk"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_similarity("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
