"""Corpus-hygiene operators for training-data pipelines: benchmark
decontamination, repetition detection, deterministic stratified
sampling, and cross-source overlap analytics.

These are the governance ops a 100 TB pretraining pipeline runs after
dedup (operators/dedup.py) and quality scoring (operators/textstats.py):

* decontamination — drop/flag training docs that share an n-gram with a
  held-out evaluation set, so benchmarks stay uncontaminated. The eval
  side is orders of magnitude smaller than the corpus, so its distinct
  gram set is broadcast and the corpus side never shuffles: one scan,
  one broadcast-hash-join, one partial-aggregated groupBy(doc_id).
* repetition stats — the classic repetition quality gates (duplicate
  n-gram fraction, most-frequent-n-gram share).  Relational explode →
  groupBy(doc_id, gram) → groupBy(doc_id) so both ratios come off one
  shuffle; the (doc_id, gram) exchange is reused across the two aggs.
* deterministic hash sampling — per-stratum keep rates decided by an
  integer comparison on an md5-derived uniform, so the sample is
  reproducible run-to-run and engine-to-engine (no Spark-internal RNG,
  no seed drift between executors), and membership of a given doc is
  stable as the corpus grows — the property that makes ablation
  re-runs comparable.
* source overlap matrix — pairwise Jaccard between the distinct-gram
  sets of each source: the corpus-level analytic behind "which crawls
  duplicate each other".  Gram-keyed equi-join (never a cross join);
  candidate pairs are bounded by grams shared across sources.

Hashing is md5-based so the DuckDB oracle reproduces every decision
bit-for-bit (see operators/dedup.py for the same portability argument).
All ratios are exact-integer divisions evaluated in IEEE double — both
engines produce identical bits, so flags thresholded on them agree.

Reference parity: the reference has no corpus-governance layer (it is a
generic MapReduce engine — see SURVEY.md §0); these extend the
training-data-pipeline family the same way operators/dedup.py does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_project_spark.execution import widen_for_compute
from hadoop_project_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
)
from hadoop_project_spark.operators.dedup import doc_shingles

# Decontamination gram order. Production pipelines use 8-13-word grams;
# the driver's synthetic docs are ~25-60 tokens from a small vocabulary,
# so 3-word grams give the same sparse-but-nonempty hit profile that
# 13-grams give on web text.
DECONTAM_K = 3

# Repetition gate: flag a doc when its most frequent bigram accounts for
# >= 8% of all bigram occurrences (the Gopher-style "top n-gram
# fraction" rule, threshold tuned to the driver corpus's distribution).
TOP_BIGRAM_FLAG = 0.08

# Deterministic sampler: md5-derived 32-bit uniform.
SAMPLE_BITS = 32
SAMPLE_MOD = 1 << SAMPLE_BITS

# Per-source document cap (the "domain capping" rule crawl pipelines
# apply so one over-represented source can't dominate the training mix).
# 20 < the 25 docs/source at sf0.01, so the cap genuinely drops rows at
# the driver's correctness SF — not a vacuous keep-everything filter.
SOURCE_CAP = 20


def contamination_report(
    docs: DataFrame, bench_pred: Column, k: int = DECONTAM_K
) -> DataFrame:
    """Per-corpus-doc count of distinct k-grams shared with the
    benchmark split: (doc_id, n_grams, n_overlap_grams, overlap_frac).

    Only contaminated docs (>=1 shared gram) are returned — at scale the
    clean 99%+ of the corpus never leaves its scan stage.  The benchmark
    gram set is broadcast: the corpus side is a single explode →
    broadcast-join → groupBy(doc_id), with no corpus-wide shuffle except
    the per-doc distinct/aggregate on doc_id (map-side combined).
    """
    grams = doc_shingles(docs, k=k)
    bench_grams = (
        grams.where(bench_pred).select("sh").distinct()
    )
    corpus_grams = grams.where(~bench_pred)
    totals = corpus_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap_grams"))
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_overlap_grams",
            (
                F.col("n_overlap_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("overlap_frac"),
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition gates per document:
    (doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac, repetitive).

    One explode + one shuffle on (doc_id, bigram); the second aggregate
    groups by doc_id only, so its exchange nests inside the first
    (partial aggregation on both).  Ratios are exact-int divisions —
    bit-identical across engines — so the `repetitive` threshold flag
    is deterministic too.
    """
    toks = widen_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", F.split(normalize_text("text"), " ").alias("toks")
    )
    bigrams = toks.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("toks"), 2)).alias("g")
    )
    counts = bigrams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    total = F.sum("c").cast("double")
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        (F.max("c").cast("double") / total).alias("top_bigram_frac"),
        (F.lit(1.0) - F.count("*").cast("double") / total).alias(
            "dup_bigram_frac"
        ),
        (F.max("c").cast("double") / total >= F.lit(TOP_BIGRAM_FLAG)).alias(
            "repetitive"
        ),
    )


def hash_uniform32(key: Column) -> Column:
    """Deterministic 32-bit uniform from a key column: first 8 hex digits
    of md5(key) as a bigint in [0, 2^32).  Portable: DuckDB's
    CAST('0x' || substr(md5(k), 1, 8) AS UBIGINT) computes the identical
    value, so sampling decisions replay exactly in the oracle."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def stratified_hash_sample(
    docs: DataFrame, rate_num: Column, rate_den: int
) -> DataFrame:
    """Keep each doc iff hash_uniform32(doc_id) * rate_den <
    rate_num * 2^32 — an exact integer comparison, so the kept set is
    identical on every engine and every run, and each stratum's keep
    probability is rate_num/rate_den.

    Emits (doc_id, source, sample_u) where sample_u = u/2^32 (exact:
    the denominator is a power of two).  No shuffle at all — the sample
    is a scan-stage filter, which is what makes it usable as the first
    stage of a 100 TB pipeline.
    """
    u = hash_uniform32(F.col("doc_id"))
    keep = (u * F.lit(rate_den)) < (rate_num.cast("long") * F.lit(SAMPLE_MOD))
    return docs.where(keep).select(
        "doc_id",
        "source",
        (u.cast("double") / F.lit(float(SAMPLE_MOD))).alias("sample_u"),
    )


def cap_per_source(
    docs: DataFrame, quality: Column, cap: int = SOURCE_CAP
) -> DataFrame:
    """Domain capping: keep at most ``cap`` documents per source, best
    quality first — the mix-governance rule that stops one crawl from
    dominating the corpus.

    Per the house determinism rule, the RANKING decision uses the
    quality score rounded to 9 dp with doc_id as total-order tie-break,
    so the kept set is identical on every engine. The window partitions
    by source — per-source state only, so skew is bounded by the largest
    single source and AQE can split stragglers; there is no global
    ordering anywhere.

    Output: (source, doc_id, quality_r, cap_rank) for kept docs.
    """
    from pyspark.sql import Window

    q = F.round(quality, 9)
    w = Window.partitionBy("source").orderBy(F.desc("quality_r"), F.asc("doc_id"))
    return (
        docs.select("source", "doc_id", q.alias("quality_r"))
        .withColumn("cap_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("cap_rank") <= cap)
    )


def source_overlap_matrix(docs: DataFrame, k: int = 3) -> DataFrame:
    """Pairwise Jaccard similarity between sources' distinct k-gram
    sets: (source_a, source_b, n_inter, jaccard) for source_a <
    source_b.

    Shape: distinct (source, gram) — cardinality bounded by
    sources × vocabulary, not by corpus rows — then a gram-keyed
    self-equi-join (AQE-splittable; never a cross join) and two tiny
    aggregates.  The per-source set sizes (|sources| rows) come back as
    a broadcast join.
    """
    toks = widen_for_compute(docs.select("source", "text")).select(
        "source", F.split(normalize_text("text"), " ").alias("toks")
    )
    sg = (
        toks.select(
            "source", F.explode(shingles_from_tokens(F.col("toks"), k)).alias("sh")
        )
        .distinct()
    )
    sizes = sg.groupBy("source").agg(F.count("*").alias("n"))
    a = sg.alias("a")
    b = sg.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
