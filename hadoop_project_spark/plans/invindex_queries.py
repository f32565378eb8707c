"""Inverted-index / phrase-search queries (operators/invindex.py) —
the canonical Hadoop workload family the reference's WordCount
(WordCount1/src/main/java/WordCount.java:24) is the degenerate form of,
each with a position-exact DuckDB oracle.

The phrase set is a query LITERAL (like the quality model's frozen
weights, operators/textstats.py): fixed mixed-length phrases chosen to
occur at every fixture scale so the hit columns are genuinely
exercised. The oracle recomputes tokenization, 0-based positions, and
the start-position scan from scratch, so a hash-green row certifies the
positional intersection arithmetic, not just the counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators import invindex as ix
from hadoop_project_spark.plans.registry import register
from hadoop_project_spark.plans.text_pipeline import SQL_NORM

# Mixed-length phrase workload: bigrams of the fixture's core vocabulary
# plus trigrams verified present at sf0.001 AND sf0.01 AND sf0.1 (counts
# 4-11 at the smallest scale — non-degenerate everywhere).
SEARCH_PHRASES = [
    "table scan",
    "hash join",
    "sort merge",
    "query big part",
    "join part filter",
]

_SQL_TOKS = f"""toks AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM documents
    )"""


def _sql_phrase_leg(ph: str) -> str:
    words = ph.split()
    k = len(words)
    conds = " AND ".join(
        f"toks[i + {j}] = '{w}'" for j, w in enumerate(words)
    )
    return f"""SELECT '{ph}' AS phrase, doc_id,
             len([i for i in range(1, len(toks) - {k} + 2) if {conds}])
               AS n_occ
      FROM toks"""


def _sql_phrase_search_stats() -> str:
    legs = "\n      UNION ALL\n      ".join(
        _sql_phrase_leg(ph) for ph in SEARCH_PHRASES
    )
    return f"""
    WITH {_SQL_TOKS},
    occ AS (
      {legs}
    )
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_occ) AS BIGINT) AS n_hits
    FROM occ WHERE n_occ > 0 GROUP BY phrase
    """


@register(
    "inverted_index_directory",
    priority=10,  # new in round 8 -> first driver window
    oracle=f"""
    WITH {_SQL_TOKS},
    p AS (
      SELECT doc_id, UNNEST(toks) AS term FROM toks
    )
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM p GROUP BY term
    """,
    tags=("text", "index", "P1", "A1", "extension"),
)
def inverted_index_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term index directory (df, cf, doc-id span) — the metadata an
    inverted-index build emits beside its postings; WordCount (P1/A1)
    plus the document-frequency/posting-span columns a real index needs.
    One partial-aggregated shuffle keyed by term; output is
    vocabulary-sized (Heaps-law sublinear at corpus scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return ix.index_directory(docs)


@register(
    "phrase_search_hits",
    priority=10,  # new in round 8 -> first driver window
    oracle=_sql_phrase_search_stats(),
    tags=("text", "index", "phrase-search", "extension"),
)
def phrase_search_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mixed-length phrase search by positional posting-list
    intersection (operators/invindex.phrase_occurrences): per phrase,
    how many documents contain it and the total occurrence count
    (overlaps included). The probe cost is the phrase words' posting
    lists, never a corpus scan per phrase; the oracle recomputes the
    start-position scan over the token arrays, so the hash-match
    certifies the (doc_id, pos - i) intersection arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return ix.phrase_search_stats(docs, SEARCH_PHRASES)
