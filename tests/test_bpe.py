"""BPE trainer (operators/bpe.py) vs an independent pure-Python
reference implementation — the same independent-reimplementation pin
the K-Means family uses (tests/test_kmeans.py), on top of the full
chained-SQL oracle the driver checks (plans/bpe_queries.py).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Row, functions as F

from hadoop_project_spark.operators import bpe


# -- independent reference (classic Sennrich-style trainer) -----------------


def _ref_normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _ref_pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += n
    return c


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts: list[str], n_merges: int) -> list[dict]:
    words: Counter = Counter()
    for t in texts:
        for w in _ref_normalize(t).split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for idx in range(1, n_merges + 1):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # total order: count DESC, then lexicographic pair
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(
            {"merge_idx": idx, "lhs": a, "rhs": b, "merged": a + b,
             "pair_count": cnt}
        )
        vocab = {_ref_apply(s, a, b): n for s, n in vocab.items()}
    return merges


# -- tests -------------------------------------------------------------------


def test_trainer_matches_reference_on_fixture(spark, sf_dir):
    from hadoop_project_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe.train_merges(docs, 8)
    want = _ref_train(texts, 8)
    assert got == want


def test_trainer_matches_reference_tiny_runs(spark):
    # exercises the greedy-left run semantics ('aaaa' -> aa|aa) and the
    # chained second-order merge ('aa'+'aa' -> 'aaaa' next round)
    texts = ["aaaa aaaa baab", "aaaa x yy yy"]
    docs = spark.createDataFrame([Row(text=t) for t in texts])
    got = bpe.train_merges(docs, 4)
    want = _ref_train(texts, 4)
    assert got == want
    assert got[0]["lhs"] == "a" and got[0]["rhs"] == "a"


def test_symbols_never_contain_oracle_markers(spark, sf_dir):
    # the SQL oracle's representation invariant (plans/bpe_queries.py):
    # corpus symbols must never contain chr(1)/chr(31)
    from hadoop_project_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.filter(
        docs.text.contains("\x01") | docs.text.contains("\x1f")
    ).count()
    assert bad == 0


def test_control_chars_stripped_from_tokenization(spark):
    """ADVICE r7: the marker invariant is ENFORCED by the operator, not
    just asserted on the fixture — a corpus word carrying chr(1)/chr(31)
    is cleaned before symbol work, so token counts stay exact, and a
    word that is nothing but control chars vanishes."""
    texts = ["ab\x01ab cd", "ab\x1fab \x01\x01 cd"]
    docs = spark.createDataFrame([Row(text=t) for t in texts])
    wf = {r["word"]: r["n"] for r in bpe.word_freq_table(docs).collect()}
    assert wf == {"abab": 2, "cd": 2}

    docs2 = docs.withColumn("source", F.lit("s"))
    row = bpe.encode_token_counts(docs2, bpe.train_merges(docs, 2)).collect()[0]
    # cleaned corpus = abab abab cd cd -> n_words 4, n_chars 12
    assert (row["n_words"], row["n_chars"]) == (4, 12)
