"""Unit tests for corpus-governance operators (operators/corpus.py) on
crafted inputs where every decision is checkable by hand; the full
pipeline-level verification is tests/test_oracle_parity.py's DuckDB
hash-match on the four registered queries."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row, functions as F

from hadoop_project_spark.operators import corpus as cp


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )


def test_contamination_report_flags_shared_trigrams(spark):
    # doc 0 is the "benchmark"; doc 1 shares its trigram, doc 2 doesn't.
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma", "src0"),
            (1, "alpha beta gamma delta", "src0"),
            (2, "one two three four", "src0"),
        ],
    )
    out = cp.contamination_report(docs, bench_pred=F.col("doc_id") == 0)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1}
    # doc 1 trigrams: {a b g, b g d}; one overlaps the benchmark
    assert rows[1].n_grams == 2
    assert rows[1].n_overlap_grams == 1
    assert rows[1].overlap_frac == 0.5


def test_repetition_stats_ratios_exact(spark):
    # "x y x y x y" -> bigrams: [x y, y x, x y, y x, x y] = 5 total,
    # 2 distinct, top count 3.
    docs = _docs(spark, [(1, "x y x y x y", "src0")])
    row = cp.repetition_stats(docs).collect()[0]
    assert row.n_bigrams == 5
    assert row.top_bigram_frac == 3 / 5
    assert row.dup_bigram_frac == 1 - 2 / 5
    assert bool(row.repetitive) is True  # 0.6 >= 0.08


def test_hash_uniform32_matches_md5(spark):
    df = spark.range(5).select(
        "id", cp.hash_uniform32(F.col("id")).alias("u")
    )
    for r in df.collect():
        expect = int(hashlib.md5(str(r.id).encode()).hexdigest()[:8], 16)
        assert r.u == expect


def test_stratified_hash_sample_rate_and_determinism(spark):
    rows = [(i, f"word{i} text", "src1") for i in range(2000)]
    docs = _docs(spark, rows)
    kept = cp.stratified_hash_sample(docs, rate_num=F.lit(1), rate_den=4)
    n1 = kept.count()
    # md5 uniform: expect ~500 of 2000 at rate 1/4 (binomial 3σ ≈ 58)
    assert 400 <= n1 <= 600
    # deterministic: identical kept set on a second run
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in cp.stratified_hash_sample(
            docs, rate_num=F.lit(1), rate_den=4
        ).collect()
    }
    assert ids1 == ids2
    # sample_u bounds respect the rate threshold
    assert all(
        r.sample_u < 0.25 for r in kept.collect()
    )


def test_source_overlap_matrix_jaccard(spark):
    # srcA and srcB share exactly one trigram; srcC shares none.
    docs = _docs(
        spark,
        [
            (1, "a b c d", "srcA"),  # trigrams: {a b c, b c d}
            (2, "a b c x", "srcB"),  # trigrams: {a b c, b c x}
            (3, "p q r s", "srcC"),
        ],
    )
    out = {
        (r.source_a, r.source_b): r
        for r in cp.source_overlap_matrix(docs).collect()
    }
    assert set(out) == {("srcA", "srcB")}
    r = out[("srcA", "srcB")]
    assert r.n_inter == 1
    assert r.jaccard == 1 / 3  # 1 shared of 2+2-1
