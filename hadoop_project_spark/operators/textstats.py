"""Text-analysis operators for large-scale corpus pipelines: token
counting, quality scoring, language ID, document fingerprinting.

Design for 100 TB: every function here is a pure Column expression
(split/filter/transform/aggregate higher-order functions) — no Python
UDFs, so the whole pipeline stays inside one WholeStageCodegen span and
scales linearly with input splits; there is no shuffle at all for
per-document scoring.

Determinism: scores use only rational arithmetic (+,-,*,/, least,
greatest) over exact integer counts — no transcendental functions — so
the DuckDB oracle reproduces every double bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from hadoop_project_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    tokenize,
    word_shingles,
)

# Small deterministic stopword profiles. The language-ID operator is a
# stopword-hit heuristic (the classic cheap n-gram/stopword LID
# baseline); profiles are module constants so the SQL oracle is generated
# from the same lists.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "los", "y", "es", "se", "del", "las", "por", "con", "para"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}
LANG_PRIORITY = ("en", "de", "fr", "es", "zh")  # tie-break order

PUNCT_RE = r"[a-z0-9\s]"  # applied to lowercased text; what's left is "punct"


def tokens_nonempty(col: str | Column) -> Column:
    """Non-empty whitespace tokens (array<string>)."""
    return F.filter(tokenize(col), lambda t: t != F.lit(""))


def token_count(col: str | Column) -> Column:
    """Whitespace token count — the cheap proxy for BPE token budget."""
    return F.size(tokens_nonempty(col)).cast("long")


def bpe_proxy_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: split on word/non-word boundaries so
    punctuation and digit runs count as separate tokens (a deterministic
    stand-in for a real tokenizer's fragment count)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"\s+|(?<=\W)(?=\w)|(?<=\w)(?=\W)")
    return F.size(F.filter(pieces, lambda t: t != F.lit(""))).cast("long")


# Letters / digit runs / single punctuation as separate fragments — the
# RE2-safe twin of bpe_proxy_token_count's lookaround split, shared with
# the SQL oracles (DuckDB's regex engine has no lookarounds). Certified
# cross-engine by doc_token_stats.
BPE_EXTRACT_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_fragment_count(col: str | Column) -> Column:
    """BPE-ish fragment count via regexp_extract_all(BPE_EXTRACT_PATTERN)
    — the form with a proven-parity SQL twin (prefer over
    bpe_proxy_token_count when the result feeds an oracle-checked
    column)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_EXTRACT_PATTERN), 0)).cast(
        "long"
    )


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are neither alnum nor whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    n_punct = F.length(F.regexp_replace(low, PUNCT_RE, ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_hits(col: str | Column, lang: str) -> Column:
    """Count of tokens (with duplicates) in the language's stopword set."""
    toks = F.transform(tokens_nonempty(col), F.lower)
    stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stoplist, t))).cast("long")


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic:
    length credit × punctuation penalty × stopword-density credit.
    Rational arithmetic only (oracle-exact)."""
    n_tok = token_count(col).cast("double")
    stop_den = stopword_hits(col, "en").cast("double") / F.greatest(n_tok, F.lit(1.0))
    length_credit = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_penalty = F.lit(1.0) - punct_ratio(col)
    stop_credit = F.lit(0.5) + F.lit(0.5) * F.least(F.lit(1.0), stop_den * F.lit(5.0))
    return (length_credit * punct_penalty * stop_credit).alias("quality_score")


def lang_id(col: str | Column) -> Column:
    """Stopword-profile language ID with fixed priority tie-break.

    The winner is the first language in LANG_PRIORITY whose hit count is
    >= every other language's count; all-zero → 'und'.
    """
    hits = {lg: stopword_hits(col, lg) for lg in LANG_PRIORITY}
    total = None
    for c in hits.values():
        total = c if total is None else total + c
    expr = F.lit("und")
    # build reversed when-chain so earlier languages take precedence
    for lg in reversed(LANG_PRIORITY):
        cond = F.lit(True)
        for other in LANG_PRIORITY:
            if other != lg:
                cond = cond & (hits[lg] >= hits[other])
        expr = F.when((total > 0) & cond, F.lit(lg)).otherwise(expr)
    return expr


def fingerprint(col: str | Column) -> Column:
    """Full-document fingerprint: md5 of whitespace-normalized lowercase
    text — the exact-dedup key."""
    return F.md5(normalize_text(col))


def min_shingle_fingerprint(col: str | Column, k: int = 3) -> Column:
    """Locality-sensitive fingerprint: minimum md5 over k-word shingles
    (a 1-permutation MinHash) — survives small edits that move text.

    Convenience single-expression form; hot paths should project the
    token array and use min_shingle_fingerprint_from_tokens."""
    return F.array_min(F.transform(word_shingles(col, k), F.md5))


def min_shingle_fingerprint_from_tokens(toks: Column, k: int = 3) -> Column:
    """Same as min_shingle_fingerprint but over a MATERIALIZED token-array
    column, avoiding per-shingle re-tokenization (see
    functions.text.shingles_from_tokens)."""
    return F.array_min(F.transform(shingles_from_tokens(toks, k), F.md5))


def winnowing_fingerprints(
    docs: "DataFrame",  # noqa: F821
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":  # noqa: F821
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-token shingle, then
    keep the MINIMUM hash of each sliding window of w consecutive
    shingle hashes; the distinct kept hashes are the document's
    fingerprint set. The published guarantee the md5/min-shingle
    fingerprints here lack: any shared run of ≥ w+k-1 tokens between
    two documents shares at least one fingerprint — local, not just
    probabilistic, overlap detection — while storing only ~2/(w+1) of
    the shingle hashes.

    Shape for 100 TB: shingle hashing is a per-row JVM expression
    (shingles_from_tokens + md5_i64 — the rolling-window selection
    works on position-ordered HASHES, so the hash itself needn't be
    computed incrementally); the window minimum is one
    partitionBy(doc) ORDER BY pos rows-frame — a single shuffle keyed
    by doc_id, bounded by the largest document like every per-doc
    operator here; `distinct` is a partial-aggregated exact dedup.
    Documents with fewer than w full windows keep their one
    whole-sequence minimum (pos 0) so every doc has ≥ 1 fingerprint.

    Why the explode + doc-keyed shuffle and not a zero-shuffle
    row-local array pipeline (transform → sliding array_min): measured
    same-session at sf1 (50k docs, ~100M shingle positions), this form
    runs 3.5 s where the row-local forms take 34 s (per-position
    array_min(slice(hvs, i, w))) and 42 s (doubling zip_with sliding
    min) — higher-order-function lambdas are INTERPRETED per element,
    a ~10× tax that dwarfs the exchange, while posexplode + md5 + the
    rows-frame min all stay inside codegen. Row-local also hides a
    quadratic trap: naming the hash array in its own projection does
    not protect it — CollapseProject inlines single-reference aliases
    into the consuming lambda, re-evaluating the whole shingle→md5
    chain once per window position (a >10-minute hang at sf1) unless
    the array is rebound as a lambda variable via the
    transform-over-single-element-array idiom.

    Returns (doc_id, fp) — one row per distinct fingerprint.
    """
    from pyspark.sql.window import Window

    from hadoop_project_spark.execution import widen_for_compute

    # widen on the RAW (id, text) projection: the normalize regex, the
    # shingle transform and the per-position md5 all run BEFORE the
    # doc-keyed window exchange, so a split-starved scan would
    # serialize the whole CPU stage (the round-7 slope audit's
    # signature — this operator was the one r7 CPU-heavy builder that
    # missed the shim; VERDICT r7 item 3)
    toks = widen_for_compute(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        # work_factor 32: shingle transform + per-position md5 (the
        # r7 audit's heavy builder); compressed stats under-fire the
        # widen locally (round 12, guide §2.5)
        work_factor=32,
    ).select(
        "doc_id",
        F.split(normalize_text(text_col), " ").alias("toks"),
    )
    sh = toks.select(
        "doc_id",
        F.greatest(F.size("toks") - F.lit(k - 1), F.lit(1)).alias("n_sh"),
        F.posexplode(shingles_from_tokens(F.col("toks"), k)).alias("pos", "g"),
    )
    from hadoop_project_spark.functions.text import md5_i64

    h = sh.select("doc_id", "n_sh", "pos", md5_i64(F.col("g")).alias("hv"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    full = h.withColumn("fp", F.min("hv").over(win)).filter(
        F.col("pos") <= F.greatest(F.col("n_sh") - w, F.lit(0))
    )
    return full.select("doc_id", "fp").distinct()


# Frozen linear quality model (FineWeb-Edu-style classifier filtering,
# distilled to its deployment form): at training-data scale the
# classifier itself is trained offline on a small labeled set; what
# runs over the 100 TB corpus is the exported weight vector applied to
# cheap per-document features. These literals stand in for that export
# — swapping in real trained weights changes nothing about the Spark
# plan. Features are rational functions of exact integer counts, so the
# logit is bit-identical across engines (no sigmoid: it is monotone, so
# thresholding the logit IS thresholding the probability).
QUALITY_MODEL_BIAS = -2.0
QUALITY_MODEL_W_LEN = 2.5  # saturating length credit: least(n_tok/500, 1)
QUALITY_MODEL_W_PUNCT = -4.0  # punctuation-character ratio
QUALITY_MODEL_W_STOP = 6.0  # en-stopword density (fluency proxy)
QUALITY_MODEL_W_FRAG = -1.0  # BPE fragments per whitespace token
# Admit when logit >= threshold. Calibrated on the synthetic fixture's
# logit distribution (median -2.3, p90 -2.02 at sf0.01) so the gate
# genuinely splits the corpus — a threshold no document crosses would
# make the admitted flag untested data.
QUALITY_MODEL_THRESHOLD = -2.2


def quality_model_logit(col: str | Column) -> Column:
    """Frozen-weight linear classifier logit over scan-stage features.

    Shape for 100 TB: a single per-row expression — no shuffle, no UDF,
    stays inside WholeStageCodegen; model-based filtering costs exactly
    one scan. The expression tree (left-associated sum of products) is
    mirrored verbatim in the SQL oracle so the double is bit-exact."""
    n_tok = token_count(col).cast("double")
    n_tok1 = F.greatest(n_tok, F.lit(1.0))
    len_sat = F.least(n_tok / F.lit(500.0), F.lit(1.0))
    stop_den = stopword_hits(col, "en").cast("double") / n_tok1
    frag = bpe_fragment_count(col).cast("double") / n_tok1
    return (
        F.lit(QUALITY_MODEL_BIAS)
        + F.lit(QUALITY_MODEL_W_LEN) * len_sat
        + F.lit(QUALITY_MODEL_W_PUNCT) * punct_ratio(col)
        + F.lit(QUALITY_MODEL_W_STOP) * stop_den
        + F.lit(QUALITY_MODEL_W_FRAG) * frag
    )


def filter_funnel(stats, rules) -> "DataFrame":  # noqa: F821
    """Ordered filter-funnel attrition report: one row per rule, in
    application order — ``(rule_idx, rule, n_failed_first,
    n_survivors_after)`` — where each document is attributed to the
    FIRST rule it fails (the standard corpus-pruning report shape:
    rule order matters, later rules only see earlier survivors).

    ``rules`` is an ordered list of (name, pass_condition Column) over
    ``stats``'s columns. Shape for 100 TB: one scan-stage projection
    computes the first-failing-rule index per row (a when-chain, fully
    inside WholeStageCodegen), then a SINGLE global aggregate of
    2×len(rules) conditional sums — no per-rule passes over the data,
    no shuffle beyond the one-row partial-aggregate tree — unpivoted to
    the report rows by ``stack``. All-integer output, so the report is
    hash-exact across engines.
    """
    first_fail = F.lit(None).cast("int")
    for i in reversed(range(len(rules))):
        first_fail = F.when(~rules[i][1], F.lit(i + 1)).otherwise(first_fail)
    per_doc = stats.select(first_fail.alias("ff"))
    aggs = []
    for i in range(1, len(rules) + 1):
        # when/otherwise, NOT a bare boolean cast: (NULL == i) is NULL,
        # so a rule nothing fails would sum all-NULLs to NULL instead
        # of 0 (caught by the Hypothesis model test)
        aggs.append(
            F.sum(F.when(F.col("ff") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"f{i}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("ff").isNull() | (F.col("ff") > i), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"s{i}")
        )
    row = per_doc.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), '{name}', f{i}, s{i}"
        for i, (name, _) in enumerate(rules, start=1)
    )
    return row.select(
        F.expr(
            f"stack({len(rules)}, {stack_args})"
            " as (rule_idx, rule, n_failed_first, n_survivors_after)"
        )
    )
