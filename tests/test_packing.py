"""Unit tests for context-window chunking and sequence packing
(operators/packing.py) — exact expected outputs on handwritten inputs,
plus the distributed prefix-sum vs the naive single-task window."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from hadoop_project_spark.operators import packing as pk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_exact_small_windows(spark):
    # window 4, stride 3: 10 tokens -> starts 1, 4, 7 (L=7, (7-1)%3==0)
    docs = _docs(spark, ["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"])
    out = (
        pk.chunk_documents(docs, window=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.chunk_id, r.chunk_start, r.n_chunk_tokens) for r in out] == [
        (0, 1, 4),
        (1, 4, 4),
        (2, 7, 4),
    ]


def test_chunk_tail_window_added_when_strides_miss(spark):
    # 9 tokens, window 4, stride 3: L=6, (6-1)%3 != 0 -> starts 1, 4, 6
    docs = _docs(spark, ["t0 t1 t2 t3 t4 t5 t6 t7 t8"])
    out = (
        pk.chunk_documents(docs, window=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.chunk_start, r.n_chunk_tokens) for r in out] == [
        (1, 4),
        (4, 4),
        (6, 4),
    ]


def test_chunk_short_doc_single_window(spark):
    docs = _docs(spark, ["only two", "one"])
    out = pk.chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(out) == 2
    assert by_doc[0].n_chunk_tokens == 2
    assert by_doc[1].n_chunk_tokens == 1
    assert all(r.chunk_id == 0 and r.chunk_start == 1 for r in out)


def test_chunks_cover_every_token(spark):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in (1, 5, 24, 32, 33, 57, 100)]
    docs = _docs(spark, texts)
    rows = pk.chunk_documents(docs, window=32, stride=24).collect()
    for doc_id, text in enumerate(texts):
        n = len(text.split())
        covered = set()
        for r in rows:
            if r.doc_id == doc_id:
                covered.update(
                    range(r.chunk_start, r.chunk_start + r.n_chunk_tokens)
                )
        assert covered == set(range(1, n + 1)), f"doc {doc_id}"


def test_global_offset_matches_naive_window(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("w")
    )
    got = pk.with_global_offset(df, "k", "w").orderBy("k").collect()
    naive = (
        df.withColumn(
            "off",
            F.coalesce(
                F.sum("w").over(
                    Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .orderBy("k")
        .collect()
    )
    assert [r.start_offset for r in got] == [r.off for r in naive]


def test_pack_bins_span_flags(spark):
    # budget 10: doc sizes 4,4,4 -> offsets 0,4,8; third doc spans 0->1
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in pk.pack_bins(df, budget=10).collect()}
    assert (rows[1].bin_first, rows[1].bin_last, rows[1].spans_boundary) == (0, 0, False)
    assert (rows[2].bin_first, rows[2].bin_last, rows[2].spans_boundary) == (0, 0, False)
    assert (rows[3].bin_first, rows[3].bin_last, rows[3].spans_boundary) == (0, 1, True)
    assert rows[3].start_offset == 8
