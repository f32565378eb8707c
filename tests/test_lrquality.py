"""The trained quality classifier (operators/lrquality.py): the
distributed fixed-point fit pinned against an independent pure-Python
twin with EXACT integer equality, the distillation's usefulness
(accuracy beats the base rate), and the plan shapes (partial-agg
training job; shuffle-free scoring scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators.lrquality import (
    LR_DEN,
    LR_FEATURES,
    LR_ITERS,
    W,
    lr_fit,
    lr_score,
    quality_features_quantized,
)


def _feats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features_quantized(docs)


def _python_fit(rows: list[tuple], iters: int) -> list[int]:
    """Arbitrary-precision reference fit over collected feature rows —
    the same recurrence, written independently of any Spark/SQL
    expression tree."""
    k = len(LR_FEATURES)
    wq = [0] * k
    n = len(rows)
    for _ in range(iters):
        g = [0] * k
        for y, *x in rows:
            z = sum(wq[j] * x[j] for j in range(k))
            p_num = min(max(z + 2 * W, 0), 4 * W)
            r = 4 * W * y - p_num
            for j in range(k):
                g[j] += x[j] * r
        wq = [wq[j] + g[j] // (n * LR_DEN) for j in range(k)]
    return wq


def test_fit_matches_python_twin_exactly(spark, sf_dir):
    """The distributed fit's integer weights equal the pure-Python
    arbitrary-precision recurrence bit-for-bit, at every iteration
    count (the fixed-point discipline leaves no rounding to diverge)."""
    feats = _feats(spark, sf_dir).cache()
    rows = [
        (r.y, r.x0, r.x1, r.x2, r.x3)
        for r in feats.select("y", "x0", "x1", "x2", "x3").collect()
    ]
    for iters in (1, 3, LR_ITERS):
        assert lr_fit(feats, iters=iters) == _python_fit(rows, iters)
    feats.unpersist()


def test_distillation_beats_base_rate(spark, sf_dir):
    """The trained gate must actually learn the teacher: accuracy on
    the training corpus beats the majority-class base rate by a real
    margin (the degenerate all-reject fit scores exactly the base
    rate)."""
    feats = _feats(spark, sf_dir).cache()
    wq = lr_fit(feats)
    scored = lr_score(feats, wq)
    row = scored.agg(
        F.count("*").alias("n"),
        F.sum((F.col("admitted") == (F.col("y") == 1)).cast("long")).alias(
            "ok"
        ),
        F.sum("y").alias("pos"),
    ).first()
    feats.unpersist()
    n, ok, pos = int(row["n"]), int(row["ok"]), int(row["pos"])
    acc = ok / n
    base = max(pos, n - pos) / n
    assert acc >= base + 0.15, (acc, base)
    # and both classes are actually predicted (non-degenerate)
    assert 0 < pos < n


def test_training_aggregate_is_partial_and_single_exchange(spark, sf_dir):
    """One training iteration is scan → partial HashAggregate →
    single-partition exchange of 5 partial rows → final aggregate: two
    HashAggregate levels (the map-side combine that makes the
    iteration's shuffle O(partitions), not O(docs)) and no other
    exchange."""
    feats = _feats(spark, sf_dir)
    r = F.lit(4 * W) * F.col("y") - F.least(
        F.greatest(F.lit(0).cast("long"), F.lit(0).cast("long")),
        F.lit(4 * W).cast("long"),
    )
    # the first iteration's literal-weight aggregate (w = 0)
    aggs = [F.sum(F.col(f"x{j}") * r).alias(f"g{j}") for j in range(4)]
    df = feats.agg(F.count("*").alias("n"), *aggs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("Exchange") == 1, plan


def test_scoring_scan_has_no_shuffle(spark, sf_dir):
    """The frozen-weight corpus filter is a pure projection over the
    scan — any Exchange means the deploy shape regressed."""
    scored = lr_score(_feats(spark, sf_dir), [1, 2, 3, 4])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_trained_weights_attach_or_refit(spark, tmp_path):
    """The trained weights are served model state: an unchanged source
    ATTACHES the published values (the fit callback never runs), a
    regenerated source refits and publishes a new version — the
    train-once/score-everywhere split under fingerprint governance."""
    from hadoop_project_spark.serving import ensure_trained_artifact

    src = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id bigint, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    calls = []

    def fit_rows():
        calls.append(1)
        return [("bias", len(calls))]

    name = "lr_test_governance"
    spark.sql(f"DROP TABLE IF EXISTS srv_art_{name}")
    t, rows = ensure_trained_artifact(
        spark, name, "feature STRING, wq BIGINT", src, "p1", fit_rows
    )
    assert len(calls) == 1
    # the RETURNED rows are the fit's own (round-12 coherence contract)
    assert rows == [("bias", 1)]
    assert spark.table(t).collect()[0]["wq"] == 1

    # unchanged source, fresh catalog: attach, no refit — returned
    # rows are the live version's, values-verified
    spark.sql(f"DROP TABLE {t}")
    _t, rows = ensure_trained_artifact(
        spark, name, "feature STRING, wq BIGINT", src, "p1", fit_rows
    )
    assert len(calls) == 1
    assert rows == [("bias", 1)]
    assert spark.table(t).collect()[0]["wq"] == 1

    # regenerated source: fingerprint mismatch -> refit, new version
    spark.createDataFrame(
        [(1, "a b c"), (2, "d e f"), (3, "g h i")],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(src)
    _t, rows = ensure_trained_artifact(
        spark, name, "feature STRING, wq BIGINT", src, "p1", fit_rows
    )
    assert len(calls) == 2
    assert rows == [("bias", 2)]
    assert spark.table(t).collect()[0]["wq"] == 2
