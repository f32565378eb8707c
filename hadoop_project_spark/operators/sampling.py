"""Probability-proportional-to-size (PPS) Poisson sampling with
Horvitz-Thompson estimation — deterministic, integer-exact, shuffle-free
selection.

Survey-sampling machinery for corpus telemetry at 100 TB: draw a small
weight-proportional sample per stratum (source) and estimate stratum
totals from the sample alone, with the Horvitz-Thompson unbiasedness
guarantee (estimate = sum over sample of weight/pi). Poisson PPS
(Ohlsson 1998 'sequential Poisson sampling' family) selects each row
independently with inclusion probability pi_i = min(1, k * w_i / W),
giving E[sample size] = k per stratum without any per-stratum sort or
top-k — selection is a pure scan-stage filter, the property that makes
it usable as the first stage of a petabyte pipeline (same argument as
operators/corpus.py:stratified_hash_sample, which is the unweighted
special case).

Determinism contract: the uniform is hash_uniform32(doc_id) (md5-based,
engine-portable) and the selection test is the exact integer comparison
``u * W < k * w * 2^32`` carried in DECIMAL(38,0) on the Spark side —
including the stratum weight SUM itself, so no intermediate ever
touches a wrappable 64-bit lane — and HUGEINT in the DuckDB oracle.
No float ever decides membership, so the sampled set replays
bit-identically at any scale (u*W stays under 38 digits until total
stratum weight passes ~1e28). The HT contributions are floor-quantized to 1e-6 before
summing (the repo-wide cross-row float-sum discipline — see
plans/governance_queries.py _LM_SCALE note), so the per-stratum sum is
exact integer arithmetic and partition-order independent.

The reference has no sampling surface; this extends SURVEY.md §2's
scan-filter shape (P4) with the estimation-theory layer a training-mix
pipeline needs (weighted source quotas certified by sample telemetry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop_project_spark.operators.corpus import SAMPLE_MOD, hash_uniform32

# Expected sample size per stratum.
PPS_TARGET_K = 5

# HT contribution quantization (1e-6 resolution; floor -> no tie case).
HT_SCALE = 1_000_000.0

_DEC = "decimal(38,0)"


def pps_select(
    rows: DataFrame,
    weight: Column,
    stratum: str,
    key: str,
    k: int = PPS_TARGET_K,
) -> DataFrame:
    """Input rows + (u, w, w_total, pi, selected) columns.

    One tiny groupBy over strata (broadcast back) plus a scan-stage
    filter — no data shuffle. pi = min(1, k*w/W) is two correctly-
    rounded ops (multiply exact for integer w, one divide), identical
    cross-engine; it never decides membership, only reporting.
    """
    w = weight.cast("long")
    with_w = rows.withColumn("w", w)
    # the stratum weight sum is carried in DECIMAL(38,0) from the start:
    # a BIGINT sum would wrap silently once a stratum's total weight
    # passes 2^63, flipping selection decisions (the DuckDB oracle sums
    # into HUGEINT, which never wraps)
    strata = with_w.groupBy(stratum).agg(
        F.sum(F.col("w").cast(_DEC)).alias("w_total")
    )
    u = hash_uniform32(F.col(key))
    lhs = u.cast(_DEC) * F.col("w_total").cast(_DEC)
    rhs = F.lit(k).cast(_DEC) * F.col("w").cast(_DEC) * F.lit(SAMPLE_MOD).cast(_DEC)
    pi = F.least(
        F.lit(1.0),
        (F.lit(k) * F.col("w")).cast("double") / F.col("w_total").cast("double"),
    )
    return (
        with_w.join(F.broadcast(strata), stratum)
        .withColumn("u", u)
        .withColumn("pi", pi)
        .withColumn("selected", lhs < rhs)
    )


def ht_stratum_totals(selected: DataFrame, stratum: str) -> DataFrame:
    """Horvitz-Thompson per-stratum totals from pps_select output.

    ht_total = sum(w_i / pi_i) over the sample estimates the stratum's
    true total weight; contributions are floor-quantized to HT_SCALE so
    the sum is an exact BIGINT reduction (order-free), then divided
    back once.
    """
    contrib = F.floor(
        (F.col("w").cast("double") / F.col("pi")) * F.lit(HT_SCALE)
    )
    per = (
        selected.groupBy(stratum)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("selected").cast("long")).alias("n_sel"),
            F.sum("w").alias("w_true_total"),
            F.sum(F.when(F.col("selected"), contrib).otherwise(F.lit(0))).alias(
                "ht_q"
            ),
        )
    )
    return per.select(
        stratum,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_sel").cast("long").alias("n_sel"),
        F.col("w_true_total").cast("long").alias("w_true_total"),
        (F.col("ht_q").cast("double") / F.lit(HT_SCALE)).alias("ht_total"),
    )
