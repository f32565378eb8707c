"""TF-IDF term scoring over a document corpus — the relevance-weighting
stage of corpus indexing / keyword extraction pipelines.

Spark-first shape: one explode of the materialized token array feeds a
(doc_id, term) count aggregate; the per-term document frequency is a
second aggregate OVER THE FIRST ONE's output (term df = number of
(doc, term) groups per term), so the corpus text is scanned and
shuffled exactly once — the df aggregate and the join back on ``term``
both reuse rows already reduced to the distinct (doc, term) level,
which is vocabulary-sized, not corpus-sized. The corpus size N rides in
as a 1-row cross-joined aggregate (Catalyst broadcasts it), keeping the
whole thing a single lazy plan with no driver-side action.

Determinism / oracle exactness: the classic idf uses ln(N/df) — a
transcendental whose last ulp is libm-dependent, i.e. NOT guaranteed
identical across engines. We use the rational variant idf = N/df
(multiplication and division are IEEE-754 correctly-rounded, so the
doubles match bit-for-bit in any compliant engine), and per the house
rule every float-derived DECISION rounds to 9 dp before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hadoop_project_spark.execution import widen_for_compute
from hadoop_project_spark.functions.text import normalize_text

TOP_TERMS = 3


def doc_term_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — term counts per document off one explode.

    The raw (id, text) projection is widened first (execution.py
    conventions): the normalize regex + split + explode are the CPU
    stage, and the round-8 slope audit caught this builder serializing
    on a split-starved sf1 scan exactly like the winnowing case —
    tfidf_top_terms r2 was 6.8×/decade before the widen, the worst
    honest slope on the surface, and ~2× after."""
    widened = widen_for_compute(docs.select("doc_id", text_col))
    toks = F.split(normalize_text(text_col), " ")
    return (
        widened.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = TOP_TERMS
) -> DataFrame:
    """Top-k terms per document by rational TF-IDF.

    Output: doc_id, term, tf, term_df, tfidf (rounded 9 dp), rnk.
    Rank order is (tfidf desc, term asc) — total within a document, so
    the top-k cut is deterministic on both engines.
    """
    tf = doc_term_freqs(docs, text_col)
    df_per_term = tf.groupBy("term").agg(F.count("*").cast("long").alias("term_df"))
    n_docs = docs.agg(F.count("*").alias("_n_docs"))
    scored = (
        tf.join(df_per_term, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.col("_n_docs").cast("double")
                / F.col("term_df").cast("double"),
                9,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "term_df", "tfidf", "rnk")
    )
