"""Hypothesis property tests (SURVEY.md §5 "property level"): engine
operators checked against independent pure-Python models on generated
inputs, not fixed fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_project_spark.functions.text import shingles_from_tokens
from hadoop_project_spark.operators.graph import connected_components
from hadoop_project_spark.operators.skew import salted_groupby_agg

_SETTINGS = dict(max_examples=6, deadline=None)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        max_size=12,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Label propagation must agree with a pure-Python union-find on
    arbitrary small graphs (self-loops and duplicates included)."""
    n = 10
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    # normalize: component id = min member
    comps: dict[int, int] = {}
    for i in range(n):
        root = find(i)
        comps.setdefault(root, min(j for j in range(n) if find(j) == root))
    expected = {i: comps[find(i)] for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "n long")
    edges_df = (
        spark.createDataFrame(edges, "a long, b long")
        if edges
        else spark.createDataFrame([], "a long, b long")
    )
    got = {
        r["n"]: r["component"]
        for r in connected_components(nodes, edges_df).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([1, 3, 16]),
)
def test_salted_agg_matches_direct(spark, rows, n_salts):
    """Salting is placement-only for any data and any salt count."""
    df = spark.createDataFrame(rows, "k string, v long")
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_groupby_agg(
            df,
            ["k"],
            [F.count("*").alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
            n_salts=n_salts,
        ).collect()
    }
    assert salted == direct


@settings(**_SETTINGS)
@given(
    toks=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), max_size=8
    ),
    k=st.sampled_from([1, 2, 3]),
)
def test_shingle_shape(spark, toks, k):
    """shingles_from_tokens: count == max(n-k+1, 1); every shingle joins
    exactly min(k, remaining) tokens; matches a pure-Python model."""
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    [row] = df.select(shingles_from_tokens(F.col("toks"), k).alias("s")).collect()
    got = row["s"]
    n = len(toks)
    expected = (
        [" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))]
        if n
        else [""]
    )
    # slice past the end takes what exists (SQL slice semantics)
    assert got == expected


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    window=st.integers(2, 10),
    stride=st.integers(1, 8),
)
def test_chunking_covers_and_bounds(spark, lens, window, stride):
    """Chunk sizes are ≤ window; chunk_ids are dense from 0 in start
    order; the last token is always covered. Full coverage of every
    token additionally holds whenever stride ≤ window (stride > window
    is the gappy sampled-windows regime — see chunk_starts)."""
    from hadoop_project_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, window=window, stride=stride).collect()
    for doc_id, n in enumerate(lens):
        mine = sorted(
            (r for r in rows if r.doc_id == doc_id), key=lambda r: r.chunk_id
        )
        covered = set()
        prev_start = 0
        for r in mine:
            assert 1 <= r.n_chunk_tokens <= window
            assert r.chunk_start > prev_start or r.chunk_id == 0
            prev_start = r.chunk_start
            covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
        assert [r.chunk_id for r in mine] == list(range(len(mine)))
        assert n in covered  # tail window always reaches the last token
        if stride <= window:
            assert covered == set(range(1, n + 1))
        else:
            assert covered <= set(range(1, n + 1))


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(1, 50), min_size=1, max_size=40),
    budget=st.integers(2, 64),
)
def test_packing_offsets_are_exact_cumsum(spark, weights, budget):
    """Distributed prefix-sum == pure-Python cumulative sum, and bin
    spans follow by integer division."""
    from hadoop_project_spark.operators.packing import pack_bins

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in pack_bins(df, budget=budget).collect()}
    acc = 0
    for i, w in enumerate(weights):
        r = rows[i]
        assert r.start_offset == acc
        assert r.bin_first == acc // budget
        assert r.bin_last == (acc + w - 1) // budget
        assert r.spans_boundary == (r.bin_first != r.bin_last)
        acc += w


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 3)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    mutations=st.lists(st.integers(0, 30), max_size=10),
)
def test_snapshot_diff_matches_dict_model(spark, rows, mutations):
    """snapshot_diff == a pure-Python dict comparison for arbitrary
    mutations (value bumps create 'changed', new keys 'added')."""
    from hadoop_project_spark.operators.snapshot import snapshot_diff

    old = dict(rows)
    new = dict(old)
    for k in mutations:
        new[k] = new.get(k, -1) + 1  # bump existing or add new key
    expected = {}
    for k in set(old) | set(new):
        if k not in old:
            expected[k] = "added"
        elif k not in new:
            expected[k] = "removed"
        else:
            expected[k] = "unchanged" if old[k] == new[k] else "changed"

    old_df = spark.createDataFrame(list(old.items()), "k long, v long")
    new_df = spark.createDataFrame(list(new.items()), "k long, v long")
    got = {
        r.k: r.status
        for r in snapshot_diff(old_df, new_df, ["k"], ["v"]).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    target=st.dictionaries(st.integers(0, 9), st.integers(-100, 100), max_size=8),
    source=st.dictionaries(st.integers(0, 9), st.integers(-100, 100), max_size=8),
)
def test_merge_upsert_matches_dict_model(spark, target, source):
    """merge_upsert with additive updates must agree with the obvious
    Python dict model on arbitrary key overlaps, including empty
    sides."""
    from hadoop_project_spark.operators.merge import merge_upsert

    t_df = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [], "k int, v int"
    )
    s_df = spark.createDataFrame(
        [(k, v) for k, v in source.items()] or [], "k int, v int"
    )
    out = merge_upsert(
        t_df, s_df, keys=["k"], updates={"v": lambda t, s: t + s},
        status_col="st",
    )
    got = {r["k"]: (r["v"], r["st"]) for r in out.collect()}
    exp = {}
    for k, v in target.items():
        exp[k] = (v, "unchanged")
    for k, v in source.items():
        if k in target:
            exp[k] = (target[k] + v, "updated")
        else:
            exp[k] = (v, "inserted")
    assert got == exp


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_ssjoin_matches_brute_force_on_random_docs(spark, docs):
    """Prefix-filtered Jaccard join == naive all-pairs model on random
    tiny-vocab documents (adversarial for the prefix filter: heavy
    shingle overlap, degenerate one-word docs, duplicate texts)."""
    from hadoop_project_spark.operators import ssjoin as sj

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingle_set(text):
        toks = text.split()
        if len(toks) <= sj.SPAN_K:
            return {" ".join(toks)}
        return {
            " ".join(toks[i : i + sj.SPAN_K])
            for i in range(len(toks) - sj.SPAN_K + 1)
        }

    sets = {i: shingle_set(t) for i, t in rows}
    expect = set()
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * sj.SSJOIN_TAU_DEN >= sj.SSJOIN_TAU_NUM * union:
                expect.add((a, b, inter, union))
    got = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union)
        for r in sj.prefix_filtered_jaccard_pairs(df).collect()
    }
    assert got == expect


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(1, 10_000), min_size=1, max_size=20),
    k=st.integers(1, 4),
)
def test_pps_pi_and_selection_match_integer_model(spark, weights, k):
    """PPS selection and pi against a pure-Python integer model using
    the same md5-derived uniforms — exercises clamped pi (w > W/k) and
    single-row strata."""
    import hashlib

    from hadoop_project_spark.operators import sampling as sp

    rows = [(i, "s", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    sel = sp.pps_select(df, F.col("n_chars"), "source", "doc_id", k=k)
    got = {r.doc_id: (bool(r.selected), r.pi) for r in sel.collect()}

    total = sum(weights)
    for i, w in enumerate(weights):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        exp_sel = u * total < k * w * (1 << 32)
        exp_pi = min(1.0, (k * w) / total)
        assert got[i] == (exp_sel, exp_pi)


@settings(**_SETTINGS)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
)
def test_wav_pack_decode_roundtrip(samples, rate, channels):
    """pack_wav_pcm16 → wav_decoder recovers every feature exactly for
    arbitrary PCM16 content (silence, clipping extremes, empty clips),
    through the junk LIST chunk and its alignment pad — no Spark needed;
    the container parse itself is the property under test."""
    from hadoop_project_spark.operators.multimodal import (
        pack_wav_pcm16,
        wav_decoder,
    )

    feats = wav_decoder(pack_wav_pcm16(samples, rate, channels), "wav")
    if not samples:
        assert feats == [float(rate), float(channels), 0.0, 0.0, 0.0, 0.0]
    else:
        assert feats == [
            float(rate), float(channels), float(len(samples)),
            float(sum(samples)), float(min(samples)), float(max(samples)),
        ]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 600), st.integers(0, 10)),
        min_size=1,
        max_size=25,
    )
)
def test_filter_funnel_matches_python_model(spark, rows):
    """filter_funnel's first-fail attribution and cumulative survivor
    counts must agree with a straight-line Python evaluation of the
    same ordered rules on arbitrary stat rows."""
    from hadoop_project_spark.operators.textstats import filter_funnel

    rules_py = [
        ("r_a", lambda a, b, c: a >= 10),
        ("r_b", lambda a, b, c: b <= 450),
        ("r_c", lambda a, b, c: c >= 2),
    ]
    fails = {1: 0, 2: 0, 3: 0}
    survivors_after = {1: 0, 2: 0, 3: 0}
    for a, b, c in rows:
        ff = None
        for i, (_, fn) in enumerate(rules_py, start=1):
            if not fn(a, b, c):
                ff = i
                break
        if ff is not None:
            fails[ff] += 1
        for i in range(1, 4):
            if ff is None or ff > i:
                survivors_after[i] += 1

    df = spark.createDataFrame(rows, "a long, b long, c long")
    out = filter_funnel(
        df,
        [
            ("r_a", F.col("a") >= 10),
            ("r_b", F.col("b") <= 450),
            ("r_c", F.col("c") >= 2),
        ],
    ).collect()
    got_f = {r.rule_idx: r.n_failed_first for r in out}
    got_s = {r.rule_idx: r.n_survivors_after for r in out}
    assert got_f == fails
    assert got_s == survivors_after


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(0, 100_000), min_size=2, max_size=40),
    width=st.sampled_from([128, 1024, 4096]),
)
def test_histogram_quantile_within_one_bucket(spark, cents, width):
    """The fixed-grid histogram p50 estimate (lower edge of the
    cumulative-crossing bucket) must land within one bucket width of
    the exact median for arbitrary integer values — the bound
    price_quantile_histogram flags."""
    import statistics as pystats

    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    hist = (
        df.withColumn("bucket", F.floor(F.col("cents") / width))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
        .collect()
    )
    n = len(cents)
    cum = 0
    for r in hist:
        cum += r.cnt
        if cum * 2 >= n:
            est = r.bucket * width
            break
    exact = pystats.median_low(sorted(cents))
    assert abs(exact - est) <= width
