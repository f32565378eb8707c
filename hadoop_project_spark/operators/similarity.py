"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set, scan the corpus once, then rank in two stages: a partition-local
  top-k (groupBy(partition, query) with a sorted-slice aggregate, so the
  scored set leaves its scan stage list-batched and spread over
  partitions × n_queries reducers) followed by a global per-query window
  over at most partitions × k survivors per query. A single
  Window.partitionBy(query_id) over the raw scores would collapse to
  n_queries reducer tasks at scale.
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

from hadoop_project_spark.functions.vector import dot, l2_norm


def local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Partition-local top-k on (query_id, neighbor_id, cosine) rows.

    Keeps the best k rows per (scan partition, query) with one aggregate:
    the sort key is a (-cosine, neighbor_id) struct, so ascending
    sort_array yields exactly the total order the global ranking window
    uses (cosine desc, neighbor_id asc; double negation is bit-exact).
    The global top-k per query is invariant under this pre-filter — every
    globally-ranked row is necessarily in its own partition's top-k — so
    the downstream window sees at most num_partitions × k rows per query
    instead of the whole scored set in one reducer task.
    """
    entry = F.struct(
        (-F.col("cosine")).alias("neg_cos"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("cosine").alias("cosine"),
    )
    return (
        scored.groupBy(F.spark_partition_id().alias("pid"), "query_id")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("top"))
        .select("query_id", F.explode("top").alias("e"))
        .select(
            "query_id",
            F.col("e.neighbor_id").alias("neighbor_id"),
            F.col("e.cosine").alias("cosine"),
        )
    )


def global_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k: partition-local pre-filter, then the
    ranking window over the bounded survivor set."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local_topk(scored, k)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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
    # Norms are materialized once per row on each side BEFORE the join:
    # cosine inside the join would recompute both norms per candidate
    # pair (O(pairs × dim) extra work); dot/(n_q·n_c) is arithmetically
    # identical (same sqrt-of-sum expression, evaluated earlier).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    return global_topk(scored, k)


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
    """Bucket id = integer of sign bits of <vec, plane_i>.

    The dot is rounded to 9 dp BEFORE the sign decision (the same
    strategy as cosine_round): a vector lying within an ulp of a
    hyperplane would otherwise flip its bucket between two engines'
    summation orders, changing the candidate set an oracle re-derives."""
    key = None
    for i, p in enumerate(planes):
        # one array<double> Literal node per plane, not dim individual
        # F.lit nodes (same plan-size fix as kmeans._centroid_array)
        plane = F.lit([float(x) for x in p])
        bit = F.when(
            F.round(dot(vec_col, plane), 9) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
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
    cosine_round: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.
    ``cosine_round`` rounds the cosine BEFORE ranking (oracle parity:
    ordering decisions must be made on the same values both engines
    compare).

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
    # Per-table bucket keys are materialized into named columns FIRST:
    # each key is 8 hyperplane dot products, and the multiprobe variants
    # reference the key 1 + n_planes times per table — built inline they
    # would re-evaluate the dot products per probe (36× per query row at
    # the defaults). XOR over the materialized column is free.
    all_planes = [
        make_hyperplanes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)
    ]
    bkt_cols = [
        lsh_bucket(vec_col, all_planes[t]).alias(f"bkt{t}") for t in range(n_tables)
    ]
    c_keyed = corpus.select(F.col(id_col).alias("neighbor_id"), *bkt_cols)
    q_keyed = queries.select(F.col(id_col).alias("query_id"), *bkt_cols)
    c_buckets = [
        F.struct(F.lit(t).alias("tbl"), F.col(f"bkt{t}").alias("bucket"))
        for t in range(n_tables)
    ]
    q_probes = []
    for t in range(n_tables):
        probes = [F.col(f"bkt{t}")]
        if multiprobe:
            probes += [
                F.col(f"bkt{t}").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
            ]
        q_probes += [
            F.struct(F.lit(t).alias("tbl"), p.alias("bucket")) for p in probes
        ]
    # Bucket join and dedup carry ONLY ids — vectors are fetched once per
    # unique candidate pair afterwards, so the distinct's shuffle rows
    # are 2 longs instead of 2 × dim floats + norms.
    c_ids = c_keyed.select(
        "neighbor_id", F.explode(F.array(*c_buckets)).alias("tb")
    ).select("neighbor_id", "tb.tbl", "tb.bucket")
    q_ids = q_keyed.select(
        "query_id", F.explode(F.array(*q_probes)).alias("tb")
    ).select("query_id", "tb.tbl", "tb.bucket")
    cand = (
        c_ids.join(F.broadcast(q_ids), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_full = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    cos = dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))
    if cosine_round is not None:
        cos = F.round(cos, cosine_round)
    scored = (
        cand.join(F.broadcast(q_full), "query_id")
        .join(c_full, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
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
        l2_norm(vec_col).alias("na"),
        F.col(block_col).alias("blk"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(vec_col).alias("nb"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized twin of brute_force_topk: the query matrix rides
    a closure into a scalar pandas_udf that scores each corpus batch
    against ALL queries with one numpy matmul.

    This is the documented "UDF surface" of the engine (SURVEY.md §2.8):
    when per-row math gets wide enough (large k·dim), one BLAS matmul
    per Arrow batch beats per-row JVM expression evaluation. Results are
    float64 numpy, so ranks agree with the JVM path except at exact
    cosine ties (tests compare against brute_force_topk with tolerance).

    Scale shape: identical to brute_force_topk — corpus scan stays
    partition-parallel, queries broadcast (here: serialized in the UDF
    closure), only (n_corpus × n_queries) scores then per-query top-k.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint resolution can't see the local pd import
    @pandas_udf("array<struct<query_id: long, cosine: double>>")
    def score_all(vecs):
        c_mat = np.array(vecs.tolist(), dtype=np.float64)
        c_norm = np.linalg.norm(c_mat, axis=1)
        sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
        return pd.Series(
            [
                [
                    {"query_id": int(qid), "cosine": float(s)}
                    for qid, s in zip(q_ids, row)
                ]
                for row in sims
            ]
        )

    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.explode(score_all(F.col(vec_col))).alias("qs"),
        )
        .select("neighbor_id", F.col("qs.query_id").alias("query_id"),
                F.col("qs.cosine").alias("cosine"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    return global_topk(scored, k).select("query_id", "neighbor_id", "cosine", "rank")
