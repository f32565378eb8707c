"""Positional inverted index + exact phrase search over `documents`.

The inverted index is THE canonical Hadoop/MapReduce workload — the
reference's WordCount (WordCount1/src/main/java/WordCount.java:24, §2
P1/A1) is its degenerate form (term → count, positions dropped). This
module completes it relationally: a (term, doc_id, pos) postings
relation, the per-term index directory, and the classic
positional-intersection phrase search an index exists to answer.

Shape for 100 TB:

* ``postings`` is one widened scan + posexplode — no shuffle at all
  until an aggregate/join keys it; at cluster scale the materialized
  form is a parquet table bucketed by term (sources/sinks.py S7), and
  every probe below is then a bucket-local join.
* ``index_directory`` is a single partial-aggregated groupBy(term):
  shuffle rows = one per (term, input partition), output rows = |vocab|
  — Heaps-law sublinear in the corpus.
* ``phrase_occurrences`` is the textbook positional intersection: for
  phrase w0..wk, join the per-term posting lists on (doc_id, pos - i).
  Cost is O(Σ posting-list lengths of the phrase's words), never a
  corpus scan per phrase — the probe side is term-filtered BEFORE any
  join (the filters push into the pinned postings cache / the bucketed
  index at scale), and every join key is (doc_id, pos), so a hot term
  cannot fan out: position equality admits at most one match per
  occurrence. The postings relation is pinned once and shared by all
  phrases' probes (execution.py release contract).

Exactness: token positions are 0-based over the whitespace-normalized
token sequence (functions/text.normalize_text — the same tokenization
every text operator here uses), so the DuckDB oracle reproduces counts
integer-for-integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hadoop_project_spark.execution import eager_pin, widen_for_compute
from hadoop_project_spark.functions.text import normalize_text


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, pos): the positional postings relation. Narrow
    (scan + widen + explode); interior empty tokens cannot occur because
    normalize_text collapses/trims whitespace, so positions are dense
    0..n_tokens-1 — the invariant the phrase intersection relies on.
    The one degenerate case — a document whose text normalizes to the
    empty string — yields a single '' token at pos 0; it is filtered so
    such documents contribute ZERO terms everywhere (postings, the
    directory, tf/df/dl/N/T in BM25 — the same convention
    tfidf.doc_term_freqs uses, and the oracles mirror it; ADVICE r8)."""
    toks = widen_for_compute(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select("doc_id", F.split(normalize_text(text_col), " ").alias("toks"))
    return (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "term"))
        .filter(F.col("term") != "")
        .select("term", "doc_id", "pos")
    )


def index_directory(docs: DataFrame) -> DataFrame:
    """Per-term index metadata: document frequency, collection
    frequency, and the doc-id span of the posting list — what an index
    build writes next to the postings themselves. One
    partial-aggregated shuffle keyed by term."""
    p = postings(docs)
    return p.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("cf"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


def phrase_occurrences(
    docs: DataFrame, phrases: list[str]
) -> DataFrame:
    """(phrase, doc_id, n_occ): exact occurrence counts of each phrase
    via positional posting-list intersection — start position p matches
    iff term_i sits at p + i for every word of the phrase. Overlapping
    occurrences all count ('a a a' contains 'a a' twice), matching the
    classic positional-index semantics and the oracle's position scan.

    The postings relation is pinned once; each phrase contributes
    len(words) term-filtered probes joined on (doc_id, pos). Phrase
    lists are query literals (like the quality model's frozen weights),
    so plan size is O(Σ phrase lengths) — at 100 TB the same joins run
    against the bucketed postings table instead of the cache
    (phrase_occurrences_over is exactly that shared probe half)."""
    return phrase_occurrences_over(eager_pin(postings(docs)), phrases)


def phrase_occurrences_over(p: DataFrame, phrases: list[str]) -> DataFrame:
    """The probe half of phrase_occurrences, over an EXISTING postings
    relation — shared by the in-session pinned path and the stored
    term-bucketed index (build_postings_table): against the stored
    table, each term-equality filter pushes into the parquet scan and
    prunes to that term's bucket, so a probe touches only the phrase
    words' posting buckets. Rejects degenerate phrase lists loudly
    (ADVICE r8) instead of IndexError-ing."""
    if not phrases:
        raise ValueError("phrase_occurrences: empty phrase list")
    blank = [ph for ph in phrases if not ph.split()]
    if blank:
        raise ValueError(
            f"phrase_occurrences: blank/whitespace-only phrases: {blank!r}"
        )
    outs = []
    for ph in phrases:
        words = ph.split()
        cur = p.filter(F.col("term") == words[0]).select("doc_id", "pos")
        for i, w in enumerate(words[1:], start=1):
            nxt = p.filter(F.col("term") == w).select(
                "doc_id", (F.col("pos") - i).alias("pos")
            )
            cur = cur.join(nxt, ["doc_id", "pos"])
        outs.append(
            cur.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_occ"))
            .select(F.lit(ph).alias("phrase"), "doc_id", "n_occ")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def phrase_search_stats(docs: DataFrame, phrases: list[str]) -> DataFrame:
    """(phrase, n_docs, n_hits): the per-phrase rollup of
    phrase_occurrences — the result page header of a search engine."""
    occ = phrase_occurrences(docs, phrases)
    return occ.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_occ").cast("long").alias("n_hits"),
    )


# BM25 constants k1 = 1.2, b = 0.75 folded to the integer coefficients
# of the cleared-denominator form (so every operand below is an exact
# integer): tf_part = tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/avgdl) with
# avgdl = T/N becomes 22·T·tf / (10·T·tf + 3·T + 9·dl·N) after
# multiplying through by 10·T.
BM25_TFPART_NUM = 22  # 10·(k1+1)
BM25_TFPART_TF = 10  # 10
BM25_TFPART_T = 3  # 10·k1·(1−b)
BM25_TFPART_DLN = 9  # 10·k1·b


def bm25_topk(
    docs: DataFrame, queries: list[str], k: int = 10
) -> DataFrame:
    """Top-k documents per bag-of-words query under BM25 (Robertson et
    al., the Okapi TREC-3 weighting; k1 = 1.2, b = 0.75 defaults) —
    search scoring over the index relations, cross-engine exact.

    Determinism discipline (the tfidf.py rational-idf rule, extended):
    ln-free rational idf (N − df + ½)/(df + ½) = (2N−2df+1)/(2df+1) and
    the cleared-denominator tf part are each ONE correctly-rounded
    double division over exact integer operands (products stay < 2^53
    through ~10× the sf1 corpus; beyond that, widen to decimal), their
    product is a correctly-rounded multiply — bit-identical doubles in
    any IEEE engine. The per-(query, doc) SUM over matched terms is the
    one order-sensitive step, so each term score is first cast to
    DECIMAL(28,9) (9-dp house decision rounding): the sum is then exact
    and partition-order independent, ranking compares decimals, and the
    output score is one final decimal→double cast.

    Shape for 100 TB: tf/df/dl are the index-build aggregates (all
    partial-aggregated, vocabulary- or corpus-row-bounded); the query
    relation is a broadcast literal; scoring touches only the query
    terms' posting rows; the global (N, T) scalars ride in as 1-row
    cross-joined aggregates. Top-k is a per-query window over scored
    docs — bounded by matched docs, never the corpus."""
    from pyspark.sql import Window

    from hadoop_project_spark.operators.tfidf import doc_term_freqs

    spark = docs.sparkSession
    tf = eager_pin(doc_term_freqs(docs))
    dfr = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    scal = tf.agg(
        F.countDistinct("doc_id").cast("long").alias("n"),
        F.sum("tf").cast("long").alias("t"),
    )
    qt = spark.createDataFrame(
        [(q, t) for q in queries for t in q.split()], "query string, term string"
    )
    n, t = F.col("n"), F.col("t")
    idf = (2 * n - 2 * F.col("df") + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    tfpart = (F.lit(BM25_TFPART_NUM) * t * F.col("tf")).cast("double") / (
        F.lit(BM25_TFPART_TF) * t * F.col("tf")
        + F.lit(BM25_TFPART_T) * t
        + F.lit(BM25_TFPART_DLN) * F.col("dl") * n
    ).cast("double")
    scored = (
        F.broadcast(qt)
        .join(tf, "term")
        .join(dfr, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "query",
            "doc_id",
            (idf * tfpart).cast("decimal(28,9)").alias("s"),
        )
    )
    agg = scored.groupBy("query", "doc_id").agg(
        F.sum("s").alias("sdec"),
        F.count("*").cast("long").alias("n_terms"),
    )
    w = Window.partitionBy("query").orderBy(
        F.desc("sdec"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query",
            F.col("rnk").cast("int").alias("rnk"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_terms",
            F.col("sdec").cast("double").alias("score"),
        )
    )
