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

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.execution import run_overlapped
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

# Bag-of-words retrieval workload for BM25 (vocabulary terms only, so
# every query matches documents at every fixture scale).
BM25_QUERIES = [
    "table scan",
    "hash join merge",
    "spark stream window",
]
BM25_K = 10

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
      -- term <> '' mirrors operators/invindex.postings: a document whose
      -- text normalizes to empty contributes zero terms (ADVICE r8)
      SELECT * FROM (
        SELECT doc_id, UNNEST(toks) AS term FROM toks
      ) WHERE term <> ''
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


# Proximity workload: distinct-term pairs verified co-occurring within
# the window at sf0.001 AND sf0.01 AND sf0.1 (130-1600 docs each —
# non-degenerate everywhere).
PROX_PAIRS = [
    ("table", "scan"),
    ("hash", "join"),
    ("query", "filter"),
    ("stream", "window"),
    ("sort", "merge"),
]
PROX_WINDOW = 4


def _sql_proximity() -> str:
    legs = "\n      UNION ALL\n      ".join(
        f"""SELECT '{a} {b}' AS pair,
             CAST(COUNT(DISTINCT x.doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM (
        SELECT pa.doc_id
        FROM p pa JOIN p pb
          ON pa.doc_id = pb.doc_id
         AND pa.term = '{a}' AND pb.term = '{b}'
         AND abs(pa.pos - pb.pos) <= {PROX_WINDOW}
      ) x"""
        for a, b in PROX_PAIRS
    )
    return f"""
    WITH {_SQL_TOKS},
    p AS (
      SELECT doc_id, UNNEST(toks) AS term,
             UNNEST(range(0, len(toks))) AS pos
      FROM toks
    )
    {legs}
    """


@register(
    "proximity_search_pairs",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_proximity(),
    tags=("text", "index", "proximity", "extension"),
)
def proximity_search_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search over the positional index: for each term pair,
    documents and occurrence pairs co-occurring within PROX_WINDOW
    token positions (operators/invindex.proximity_cooccurrence) — the
    third classic positional probe after exact term and phrase. The
    oracle recomputes positions with zipped UNNESTs and replays the
    banded self-join, so the hash-match certifies the position-band
    arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return ix.proximity_cooccurrence(docs, PROX_PAIRS, PROX_WINDOW)


def _sql_bm25_ctes(queries: list[str] = BM25_QUERIES) -> str:
    """The WITH-body through rk(query, doc_id, sdec, n_terms, rnk) —
    shared by the top-k oracle and the MRR/precision eval oracle
    (which scores a HARDER query workload, see EVAL_QUERIES)."""
    vals = ", ".join(
        f"('{q}', '{t}')" for q in queries for t in q.split()
    )
    return f"""{_SQL_TOKS},
    tf AS (
      -- term <> '' mirrors tfidf.doc_term_freqs: an empty-normalizing
      -- document contributes zero terms, so N/T/dl agree with Spark on
      -- degenerate documents too (ADVICE r8)
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, UNNEST(toks) AS term FROM toks
      ) WHERE term <> '' GROUP BY doc_id, term
    ),
    dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    scal AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
             CAST(SUM(tf) AS BIGINT) AS t
      FROM tf
    ),
    qt(query, term) AS (VALUES {vals}),
    scored AS (
      SELECT q.query, tf.doc_id,
             CAST(
               (CAST(2 * s.n - 2 * d.df + 1 AS DOUBLE)
                  / CAST(2 * d.df + 1 AS DOUBLE))
               * (CAST({ix.BM25_TFPART_NUM} * s.t * tf.tf AS DOUBLE)
                  / CAST({ix.BM25_TFPART_TF} * s.t * tf.tf
                         + {ix.BM25_TFPART_T} * s.t
                         + {ix.BM25_TFPART_DLN} * l.dl * s.n AS DOUBLE))
               AS DECIMAL(28, 9)) AS sc
      FROM qt q
      JOIN tf ON tf.term = q.term
      JOIN dfr d ON d.term = q.term
      JOIN dl l ON l.doc_id = tf.doc_id
      CROSS JOIN scal s
    ),
    agg AS (
      SELECT query, doc_id, SUM(sc) AS sdec,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM scored GROUP BY query, doc_id
    ),
    rk AS (
      SELECT query, doc_id, sdec, n_terms,
             row_number() OVER (PARTITION BY query
                                ORDER BY sdec DESC, doc_id) AS rnk
      FROM agg
    )"""


def _sql_bm25_topk() -> str:
    return f"""
    WITH {_sql_bm25_ctes()}
    SELECT query, CAST(rnk AS INT) AS rnk,
           CAST(doc_id AS BIGINT) AS doc_id, n_terms,
           CAST(sdec AS DOUBLE) AS score
    FROM rk WHERE rnk <= {BM25_K}
    """


def _build_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (overwrite) the stored index tables for this sf; returns
    the table prefix. Each stored-probe query rebuilds — self-contained
    and immune to stale warehouse state, and the build cost IS the
    roundtrip being measured."""
    import os

    docs = load_table(spark, sf_dir, "documents")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    prefix = f"rt_idx_{sf}"
    ix.build_index_tables(docs, prefix)
    return prefix


@register(
    "inverted_index_build_roundtrip",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_phrase_search_stats(),
    tags=("text", "index", "phrase-search", "roundtrip", "S7", "extension"),
)
def inverted_index_build_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-index roundtrip: write the postings as a term-bucketed
    sorted parquet table (operators/invindex.build_index_tables), then
    answer the phrase workload FROM THE STORED TABLE — each word's
    term-equality filter prunes to its bucket at the scan, so the probe
    reads only the phrase words' posting buckets (plan-gated in
    tests/test_plan_shapes.py). Hash-matching the from-scratch oracle
    certifies build → bucketed write → catalog read → positional
    intersection end-to-end — the 100 TB shape the module docstring
    prescribes, measured instead of asserted (VERDICT r8 #1)."""
    prefix = _build_index(spark, sf_dir)
    p = spark.table(ix.index_table_names(prefix)[0])
    return ix.phrase_search_stats_over(p, SEARCH_PHRASES)


@register(
    "bm25_topk_stored",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_bm25_topk(),
    tags=("text", "index", "retrieval", "bm25", "roundtrip", "extension"),
)
def bm25_topk_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k probing the STORED index: tf/df recovered off the
    term-bucketed postings table with zero exchange (bucket-local
    aggregates + co-located term join), document lengths read from the
    doc_id-bucketed length table, and the same two-stage top-k as the
    in-session path. Same oracle as bm25_topk — the stored layout must
    not change a single score bit."""
    prefix = _build_index(spark, sf_dir)
    return ix.bm25_topk_stored(spark, prefix, BM25_QUERIES, BM25_K)


@register(
    "index_segment_compaction_roundtrip",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_phrase_search_stats(),
    tags=("text", "index", "streaming", "roundtrip", "S7", "extension"),
)
def index_segment_compaction_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LSM ingest path, hash-certified end to end: the corpus is
    ingested as FOUR deterministic batches through the streaming
    postings-segment sink (streaming/index_segments.py — the real
    foreachBatch function, atomic batch_id-named publishes, one replay
    deliberately included to exercise the idempotence skip), compacted
    into the term-bucketed serving tables, and the phrase workload is
    answered from the compacted index. Matching the from-scratch oracle
    proves segment ingest → replay-skip → compaction → bucketed probe
    loses nothing vs the one-shot build."""
    import os
    import shutil
    import tempfile

    from hadoop_project_spark.streaming.index_segments import (
        compact_segments,
        make_postings_segment_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    seg_root = os.path.join(
        # pid-namespaced against concurrent same-host drivers (ADVICE r10 #3)
        tempfile.gettempdir(), f"rt_idx_segs_{sf}_{os.getpid()}"
    )
    shutil.rmtree(seg_root, ignore_errors=True)
    sink = make_postings_segment_sink(seg_root)
    # independent micro-batch ingests (distinct batch_id segments) —
    # overlap their tokenize+write jobs (guide §2.6); the replay stays
    # AFTER the pool so it hits the published-segment idempotence skip
    run_overlapped(
        [
            (lambda bb: lambda: sink(
                docs.filter(F.col("doc_id") % 4 == bb), bb
            ))(b)
            for b in range(4)
        ]
    )
    sink(docs.filter(F.col("doc_id") % 4 == 1), 1)  # replayed batch: no-op
    prefix = f"rt_idx_seg_{sf}"
    compact_segments(spark, seg_root, prefix)
    p = spark.table(ix.index_table_names(prefix)[0])
    return ix.phrase_search_stats_over(p, SEARCH_PHRASES)


@register(
    "index_base_plus_segments_probe",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_phrase_search_stats(),
    tags=("text", "index", "streaming", "serving", "extension"),
)
def index_base_plus_segments_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BETWEEN-compactions serving state, hash-certified: half the
    corpus lives in the term-bucketed base table (an older build), the
    other half arrives as two fresh uncompacted postings segments
    (published via the object-store-safe MANIFEST protocol — the
    atomic unit is one manifest PUT, never a directory rename; VERDICT
    r9 #2), and the phrase workload is answered over base ∪ segments —
    the read path a live search index actually serves while segments
    await the next compaction. Term filters push into both union legs
    (bucket-pruned on the base, row-group-pruned on the segments);
    matching the whole-corpus oracle proves the union serving view
    loses nothing."""
    import os
    import shutil
    import tempfile

    from hadoop_project_spark.streaming.index_segments import (
        make_postings_segment_sink,
        read_segments,
    )

    docs = load_table(spark, sf_dir, "documents")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    prefix = f"rt_idx_mix_{sf}"
    seg_root = os.path.join(
        # pid-namespaced against concurrent same-host drivers (ADVICE r10 #3)
        tempfile.gettempdir(), f"rt_idx_mix_segs_{sf}_{os.getpid()}"
    )
    shutil.rmtree(seg_root, ignore_errors=True)
    sink = make_postings_segment_sink(seg_root, publish="manifest")
    # the bucketed base build and the two fresh segments are fully
    # independent (separate outputs; the probe below reads all three)
    # — overlap the three write jobs (guide §2.6)
    run_overlapped(
        [
            lambda: ix.build_index_tables(
                docs.filter(F.col("doc_id") % 2 == 0), prefix
            ),
            lambda: sink(docs.filter(F.col("doc_id") % 4 == 1), 0),
            lambda: sink(docs.filter(F.col("doc_id") % 4 == 3), 1),
        ]
    )
    base = spark.table(ix.index_table_names(prefix)[0]).select(
        "term", "doc_id", "pos"
    )
    p = base.unionByName(
        read_segments(spark, seg_root).select("term", "doc_id", "pos")
    )
    return ix.phrase_search_stats_over(p, SEARCH_PHRASES)


# Eval workload: the 'dup' term (the fixture's one selective token,
# df≈5%) makes conjunctive relevance sets small enough that BM25's
# top-10 contains real misses — metrics spread across (0, 1) at every
# fixture scale (mrr 0.14-1.0, p@10 0.1-1.0) instead of saturating; the
# 7-term query is the saturated easy control.
EVAL_QUERIES = [
    "dup line small",
    "dup group data row",
    "dup hash join",
    "query window scan merge sort key fast",
]


def _sql_bm25_mrr_eval() -> str:
    return f"""
    WITH {_sql_bm25_ctes(EVAL_QUERIES)},
    qn AS (
      SELECT query, CAST(COUNT(DISTINCT term) AS BIGINT) AS nq
      FROM qt GROUP BY query
    ),
    rel AS (
      SELECT m.query, m.doc_id FROM (
        SELECT q.query, tf.doc_id, COUNT(DISTINCT q.term) AS nm
        FROM qt q JOIN tf ON tf.term = q.term
        GROUP BY q.query, tf.doc_id
      ) m JOIN qn ON qn.query = m.query
      WHERE m.nm = qn.nq
    ),
    topk AS (SELECT query, doc_id, rnk FROM rk WHERE rnk <= {BM25_K}),
    hit AS (
      SELECT k.query, MIN(k.rnk) AS frr, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM topk k JOIN rel r ON r.query = k.query AND r.doc_id = k.doc_id
      GROUP BY k.query
    ),
    nrel AS (
      SELECT query, CAST(COUNT(*) AS BIGINT) AS n_relevant
      FROM rel GROUP BY query
    )
    SELECT q.query,
           COALESCE(n.n_relevant, 0) AS n_relevant,
           CAST(COALESCE(h.frr, 0) AS INT) AS first_rel_rank,
           CASE WHEN h.frr IS NULL THEN 0.0
                ELSE 1.0 / CAST(h.frr AS DOUBLE)
           END AS mrr,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(BM25_K)!r}
             AS precision_at_k
    FROM (SELECT DISTINCT query FROM qt) q
    LEFT JOIN nrel n ON n.query = q.query
    LEFT JOIN hit h ON h.query = q.query
    """


@register(
    "bm25_mrr_eval",
    priority=10,  # new in round 9 -> first driver window
    oracle=_sql_bm25_mrr_eval(),
    tags=("text", "index", "retrieval", "evaluation", "extension"),
)
def bm25_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality report for the BM25 ranking: per query, MRR
    and precision@k of the top-k against the deterministic conjunctive
    relevance set (documents containing ALL query terms) — the
    retrieval twin of ann_recall_at_k and lsh_band_sweep: every ranked
    operator here ships with a measured quality number. The oracle
    recomputes the whole scoring chain AND the relevance set from
    scratch."""
    docs = load_table(spark, sf_dir, "documents")
    return ix.bm25_relevance_eval(docs, EVAL_QUERIES, BM25_K)


@register(
    "phrase_search_served",
    priority=10,  # new in round 10 -> first driver window
    oracle=_sql_phrase_search_stats(),
    tags=("text", "index", "phrase-search", "serving", "extension"),
)
def phrase_search_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING-path phrase probe (VERDICT r9 #3): attach the
    pre-built external index at its stable warehouse path
    (serving.ensure_served_index — builds only on first run or fixture
    change, O(1) metadata re-registration otherwise) and answer the
    phrase workload from it. Against `inverted_index_build_roundtrip`
    (same oracle, build-per-run) the bench now prices serving latency
    separately from build cost; the attached table keeps the bucket
    pruning plan gates (tests/test_plan_shapes.py)."""
    from hadoop_project_spark.serving import ensure_served_index

    prefix = ensure_served_index(spark, sf_dir)
    p = spark.table(ix.index_table_names(prefix)[0])
    return ix.phrase_search_stats_over(p, SEARCH_PHRASES)


@register(
    "bm25_topk_served",
    priority=10,  # new in round 10 -> first driver window
    oracle=_sql_bm25_topk(),
    tags=("text", "index", "retrieval", "bm25", "serving", "extension"),
)
def bm25_topk_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the ATTACHED pre-built index — the serving twin
    of `bm25_topk_stored` (which rebuilds per run and is therefore
    ~90% build cost): same bucket-local tf/df aggregates, same
    two-stage top-k, same oracle, but the only per-query work is the
    probe itself. The bench's stored-vs-served delta IS the measured
    build/serve split."""
    from hadoop_project_spark.serving import ensure_served_index

    prefix = ensure_served_index(spark, sf_dir)
    return ix.bm25_topk_stored(spark, prefix, BM25_QUERIES, BM25_K)


@register(
    "bm25_topk",
    priority=10,  # new in round 8 -> first driver window
    oracle=_sql_bm25_topk(),
    tags=("text", "index", "retrieval", "bm25", "extension"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents per bag-of-words query — search scoring
    over the index relations (operators/invindex.bm25_topk). The
    ln-free rational idf and the cleared-denominator tf part keep every
    double a correctly-rounded function of exact integers (tfidf.py's
    determinism discipline); per-term scores sum as DECIMAL(28,9) so
    ranking is partition-order independent, and the oracle recomputes
    tf/df/dl/N/T and the whole scoring pipeline from scratch."""
    docs = load_table(spark, sf_dir, "documents")
    return ix.bm25_topk(docs, BM25_QUERIES, BM25_K)
