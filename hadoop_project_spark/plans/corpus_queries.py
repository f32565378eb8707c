"""Corpus-governance queries over `documents`, each with a DuckDB
oracle re-deriving grams, hash-uniforms, and ratio gates from the same
constants as operators/corpus.py — a hash-match proves the sampling /
contamination / repetition decisions themselves, not just row counts.

All four register at priority=500: the driver's 50-query correctness
window is full of unique operator-family representatives, so these are
hash-verified by tests/test_oracle_parity.py in every CI run instead
(see tests/test_registry_window.py's coverage map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators import corpus as cp
from hadoop_project_spark.operators import textstats as ts
from hadoop_project_spark.plans.dedup_queries import SQL_NORM, SQL_SHINGLES_CTE
from hadoop_project_spark.plans.registry import register
from hadoop_project_spark.plans.text_pipeline import (
    SQL_NTOK,
    SQL_PUNCT_RATIO,
    SQL_QUALITY,
    _sql_stop_hits,
)

# The held-out "benchmark" split for decontamination: a deterministic
# 1/97 slice of doc ids, standing in for an eval set distributed with
# the pipeline.
BENCH_MOD = 97


@register(
    "decontaminate_ngram",
    priority=500,
    oracle=f"""
    WITH {SQL_SHINGLES_CTE},
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corp GROUP BY doc_id),
    hit AS (
      SELECT doc_id, COUNT(*) AS n_overlap_grams
      FROM corp JOIN bench USING (sh) GROUP BY doc_id
    )
    SELECT h.doc_id, t.n_grams, h.n_overlap_grams,
           CAST(h.n_overlap_grams AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
             AS overlap_frac
    FROM hit h JOIN tot t USING (doc_id)
    """,
    tags=("corpus", "decontamination", "extension"),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing a 3-gram with the benchmark split: the
    eval-set gram list is broadcast, so the corpus never shuffles except
    the per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.contamination_report(
        docs, bench_pred=F.col("doc_id") % BENCH_MOD == 0
    )


@register(
    "doc_repetition_stats",
    priority=500,
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             UNNEST([array_to_string(toks[i:i+1], ' ')
                     for i in range(1, greatest(len(toks) - 1, 1) + 1)]) AS g
      FROM norm
    ),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS top_bigram_frac,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS dup_bigram_frac,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             >= {cp.TOP_BIGRAM_FLAG} AS repetitive
    FROM cnt GROUP BY doc_id
    """,
    tags=("corpus", "repetition", "extension"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates: duplicate-bigram and
    top-bigram-share ratios plus the threshold flag, all off one
    (doc_id, bigram) shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.repetition_stats(docs)


@register(
    "docs_hash_sample",
    priority=500,
    oracle=f"""
    SELECT doc_id, source,
           CAST(u AS DOUBLE) / {float(cp.SAMPLE_MOD)} AS sample_u
    FROM (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS u,
             ((CAST(substr(source, 4) AS INT) % 4) + 1) AS rate_num
      FROM documents
    )
    WHERE CAST(u AS BIGINT) * 4 < CAST(rate_num AS BIGINT) * {cp.SAMPLE_MOD}
    """,
    tags=("corpus", "sampling", "extension"),
)
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-source keep rates of
    1/4..4/4 decided by an exact integer comparison on the md5-derived
    uniform — reproducible across runs and engines, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rate_num = (F.substring("source", 4, 10).cast("int") % 4) + 1
    return cp.stratified_hash_sample(docs, rate_num=rate_num, rate_den=4)


@register(
    "source_overlap_matrix",
    priority=500,
    oracle=f"""
    WITH norm AS (
      SELECT source, string_split({SQL_NORM}, ' ') AS toks FROM documents
    ),
    sg AS (
      SELECT DISTINCT source, sh FROM (
        SELECT source,
               UNNEST([array_to_string(toks[i:i+2], ' ')
                       for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
        FROM norm
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_inter
      FROM sg a JOIN sg b ON a.sh = b.sh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    tags=("corpus", "overlap", "extension"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level gram-set Jaccard via a gram-keyed
    self-equi-join over the (source, gram) distinct set."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.source_overlap_matrix(docs)


@register(
    "source_quality_cap",
    priority=500,
    oracle=f"""
    WITH q AS (
      SELECT source, doc_id, round({SQL_QUALITY}, 9) AS quality_r
      FROM (
        SELECT source, doc_id,
               CAST({SQL_NTOK} AS BIGINT) AS n_tok,
               {SQL_PUNCT_RATIO} AS punct_ratio,
               CAST({_sql_stop_hits('en')} AS BIGINT) AS s_en
        FROM documents
      )
    )
    SELECT source, doc_id, quality_r, cap_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY quality_r DESC, doc_id ASC) AS INT)
        AS cap_rank
      FROM q
    ) WHERE cap_rank <= {cp.SOURCE_CAP}
    """,
    tags=("corpus", "capping", "extension"),
)
def source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: at most SOURCE_CAP docs kept per source, best
    quality first (9-dp-rounded score, doc_id tie-break) — per-source
    window state only, no global ordering."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.cap_per_source(docs, ts.quality_score("text"))
