"""Trained quality classifier: distributed logistic regression with a
HARD sigmoid on fixed-point integer features — the training half of
the model-based quality gate.

plans/text_pipeline.doc_quality_model_filter deploys a FROZEN linear
logit (exported weights as literals — the right 100 TB scoring shape).
This module supplies the step before it: FIT those weights on the
corpus itself, distributed. The objective is DISTILLATION — the label
is the repo's own rational-exact quality heuristic thresholded at its
corpus median (y = quality_score ≥ QS_THRESHOLD), standing in for the
expensive teacher every real corpus pipeline distills into a cheap
linear gate (an LLM judge / a big classifier → a scan-stage logit;
FineWeb-Edu's exported-classifier shape). A deterministic teacher
keeps the label bit-identical cross-engine, so the WHOLE fit is
oracle-replayable. The fit is full-batch gradient descent where each
iteration is ONE Spark aggregate job:

    z_i  = Σ_k wq_k · xq_ik                   (BIGINT dot product)
    p_i  = clamp(1/2 + z_i/(4W), 0, 1)        (hard sigmoid, slope 1/4)
    r_i  = 4W·y_i − clamp(2W + z_i, 0, 4W)    (= 4W·(y_i − p_i), BIGINT)
    G_k  = Σ_i xq_ik · r_i                    (the gradient, BIGINT)
    wq_k ← wq_k + floor(G_k / (n · LR_DEN))   (Python-exact floor div)

Everything is integer: features are quantized to FQ units at the scan
(counts and count-ratios — the ratios' one double division is
correctly-rounded from exact sub-2^53 integer operands, so its floor
is engine-identical), weights live in WQ units, the hard sigmoid's
clamp is integer min/max (the reason for hard over smooth: exp() has
no cross-engine exactness story, clamp does — the same
bug-compatibility-by-construction discipline as the K-Means KM_QUANT
fixed point, operators/kmeans.py), and the weight update happens
DRIVER-SIDE in arbitrary-precision Python integers (O(k · iters)
driver state, k = 4). The DuckDB oracle replays the whole loop as
chained MATERIALIZED CTEs (plans/quality_lr_queries.py), emulating
Python's floored division explicitly (DuckDB's ``//`` truncates toward
zero; floor(a/b) = (a − nonneg_mod(a, b)) / b).

Why this scales: one aggregate per iteration with a map-side partial
combine (4 products + 4 sums per row), no shuffle beyond the 4-value
rollup, no per-row Python. Exactness bound: |G_k| ≤ FQ·4W·n ≈
4·10^10·n stays inside BIGINT to n ≈ 2·10^8 docs per fit — beyond
that a production pipeline fits on a sample and SCORES the full corpus
(the standard split; scoring is the frozen-logit scan and has no
bound).

Reference analog: the iterative convergence-loop drivers
(final/src/main/java/program/KDriver.java) — same fit-loop shape, here
with a classifier instead of centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_project_spark.operators import textstats as ts

# Fixed-point scales. FQ quantizes features (1.0 → 1000); WQ quantizes
# weights; W = WQ·FQ is the unit of the dot product z. LR_DEN sets the
# step: wq += floor(G / (n·LR_DEN)) is exactly learning-rate 4 on the
# true gradient (the 4 cancels the hard sigmoid's 1/4 slope).
FQ = 1000
WQ = 10_000
W = WQ * FQ
LR_DEN = 1_000_000
LR_ITERS = 8

# Teacher threshold: the heuristic quality_score's corpus median
# (~0.36-0.37 at every shipped sf), so the distilled label is near
# balanced. A fixed literal (not a computed quantile) keeps the label
# a pure per-row expression on both engines.
QS_THRESHOLD = 0.37

# feature names in weight-vector order: bias, saturating length
# credit (teacher's 100-token cap), punctuation ratio, en-stopword
# density
LR_FEATURES = ("bias", "len_sat", "punct", "stop_den")


def _floor_ratio(num: Column, den: Column) -> Column:
    """floor(num/den) for non-negative integer columns: the double
    division is correctly rounded from exact (≤2^53) operands, so the
    floor is engine-identical (same contract as the K-Means centroid
    update's one double division)."""
    return F.floor(num.cast("double") / den.cast("double")).cast("long")


def quality_features_quantized(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, y, x0..x3): FQ-quantized integer features + the
    distillation label y = (quality_score ≥ QS_THRESHOLD). x1's
    floor(min(n_tok/100,1)·FQ) simplifies to least(n_tok, 100)·10
    exactly (FQ/100 = 10) — pure integer; x2/x3 are floored count
    ratios. The teacher score is rational-exact double arithmetic
    (operators/textstats.quality_score — hash-certified cross-engine
    by doc_quality_scores), so the threshold comparison is
    deterministic on both engines."""
    c = F.col(text_col)
    n_tok = ts.token_count(text_col)
    n_tok1 = F.greatest(n_tok, F.lit(1))
    n_punct = F.length(F.regexp_replace(F.lower(c), ts.PUNCT_RE, ""))
    n_chars1 = F.greatest(F.length(c), F.lit(1))
    s_en = ts.stopword_hits(text_col, "en")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (ts.quality_score(text_col) >= F.lit(QS_THRESHOLD))
        .cast("long")
        .alias("y"),
        F.lit(FQ).cast("long").alias("x0"),
        (F.least(n_tok, F.lit(100)) * 10).cast("long").alias("x1"),
        _floor_ratio(n_punct * FQ, n_chars1).alias("x2"),
        _floor_ratio(s_en * FQ, n_tok1).alias("x3"),
    )


def _z_expr(wq: list[int]) -> Column:
    z = F.lit(0).cast("long")
    for k, w in enumerate(wq):
        z = z + F.lit(int(w)) * F.col(f"x{k}")
    return z


def lr_fit(feats: DataFrame, iters: int = LR_ITERS) -> list[int]:
    """Full-batch hard-sigmoid logistic fit over a quantized feature
    relation — ``iters`` aggregate jobs, O(k) driver state per job,
    weight updates in exact Python integer arithmetic. Returns the
    WQ-scaled integer weights. The caller should cache/pin ``feats``
    (each iteration scans it once)."""
    k = len(LR_FEATURES)
    wq = [0] * k
    n: int | None = None
    for _ in range(iters):
        r = F.lit(4 * W) * F.col("y") - F.least(
            F.greatest(_z_expr(wq) + F.lit(2 * W), F.lit(0).cast("long")),
            F.lit(4 * W).cast("long"),
        )
        aggs = [F.sum(F.col(f"x{j}") * r).alias(f"g{j}") for j in range(k)]
        row = feats.agg(F.count("*").alias("n"), *aggs).first()
        n = int(row["n"])
        if n == 0:
            return wq
        den = n * LR_DEN
        # Python // is FLOORED division (exact, arbitrary precision) —
        # the oracle emulates this explicitly
        wq = [wq[j] + int(row[f"g{j}"]) // den for j in range(k)]
    return wq


def lr_score(feats: DataFrame, wq: list[int]) -> DataFrame:
    """(doc_id, y, score_q, admitted): the frozen-weight scoring scan —
    score_q = z in W units (z ≥ 0 ⇔ hard-sigmoid p ≥ 1/2 ⇔ admit).
    This is the deployment shape: one projection, no shuffle."""
    z = _z_expr(wq)
    return feats.select(
        "doc_id",
        "y",
        z.alias("score_q"),
        (z >= 0).alias("admitted"),
    )
