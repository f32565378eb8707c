"""Trained-quality-classifier queries (operators/lrquality.py): the
hard-sigmoid logistic fit over the documents table, its corpus-scale
scoring scan, and its confusion/accuracy eval — each with a DuckDB
oracle that REPLAYS THE ENTIRE TRAINING LOOP as chained MATERIALIZED
CTE stages (the K-Means/BPE pattern: one gradient+update pair per
iteration), so a hash-green driver row certifies all LR_ITERS
iterations end-to-end, not just the final scan.

The oracle emulates Python's FLOORED integer division explicitly
(DuckDB ``//`` truncates toward zero): floor(a/d) =
(a − ((a % d + d) % d)) / d — the weight update is the only place the
two engines' integer semantics differ, and this pins it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.execution import eager_pin, widen_for_compute
from hadoop_project_spark.operators.lrquality import (
    FQ,
    LR_DEN,
    LR_FEATURES,
    LR_ITERS,
    QS_THRESHOLD,
    W,
    lr_fit,
    lr_score,
    quality_features_quantized,
)
from hadoop_project_spark.plans.registry import register
from hadoop_project_spark.plans.text_pipeline import (
    SQL_NTOK,
    SQL_PUNCT_RATIO,
    SQL_QUALITY,
    _sql_stop_hits,
)

_K = len(LR_FEATURES)


def _sql_fdiv(a: str, d: str) -> str:
    """Python-floored integer division in DuckDB (exact, no doubles)."""
    return f"(({a}) - ((({a}) % ({d}) + ({d})) % ({d}))) // ({d})"


# SQL_QUALITY references columns (n_tok, punct_ratio, s_en): compute
# them in the inner projection, derive the teacher label + quantized
# features outside — the same expression tree quality_score /
# quality_features_quantized evaluate Spark-side.
_SQL_FEATS = f"""feats AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN {SQL_QUALITY} >= {QS_THRESHOLD}
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
             CAST({FQ} AS BIGINT) AS x0,
             CAST(least(n_tok, 100) * 10 AS BIGINT) AS x1,
             CAST(floor(CAST(n_punct * {FQ} AS DOUBLE)
                        / CAST(n_chars1 AS DOUBLE)) AS BIGINT) AS x2,
             CAST(floor(CAST(s_en * {FQ} AS DOUBLE)
                        / CAST(greatest(n_tok, 1) AS DOUBLE)) AS BIGINT)
               AS x3
      FROM (
        SELECT doc_id,
               CAST({SQL_NTOK} AS BIGINT) AS n_tok,
               {SQL_PUNCT_RATIO} AS punct_ratio,
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '',
                                          'g')) AS BIGINT) AS n_punct,
               CAST(greatest(length(text), 1) AS BIGINT) AS n_chars1,
               CAST({_sql_stop_hits('en')} AS BIGINT) AS s_en
        FROM documents
      )
    ),
    nrows AS MATERIALIZED (SELECT COUNT(*) AS n FROM feats)"""


def _sql_fit_chain(iters: int = LR_ITERS) -> str:
    """CTE stages w0 .. w{iters}: zero init, then one (gradient,
    floored-update) pair per iteration — integer arithmetic throughout."""
    cols = ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(_K))
    stages = [f"w0 AS MATERIALIZED (SELECT {cols})"]
    z = " + ".join(f"w.w{j} * f.x{j}" for j in range(_K))
    for i in range(1, iters + 1):
        gsums = ", ".join(f"SUM(x{j} * r) AS g{j}" for j in range(_K))
        stages.append(f"""g{i} AS MATERIALIZED (
      SELECT {gsums}
      FROM (
        SELECT f.*, 4 * {W} * f.y
               - least(greatest({z} + 2 * {W}, 0), 4 * {W}) AS r
        FROM feats f, w{i - 1} w
      )
    )""")
        # CAST back to BIGINT: DuckDB's SUM(BIGINT) yields HUGEINT, and
        # without the cast the int128 type rides the whole w-chain into
        # the query's OUTPUT columns (train's wq, corpus_filter's
        # score_q). The VALUES are identical either way (|w| < 10^6 ≪
        # 2^63), but HUGEINT is the one output type the driver's
        # value-hash canonicalizes differently from int64 — the
        # two-round quality_lr_train/_corpus_filter hash-red signature
        # (every other red-suspect was eliminated: ASCII/BMP fuzz shows
        # both engines agree on feats and the full fit chain for all
        # text, and eval — the one trio member whose oracle CASTs every
        # output column — was green throughout). Registry convention:
        # cast output numerics to explicit BIGINT/DOUBLE on both sides.
        ups = ", ".join(
            f"CAST(w.w{j} + {_sql_fdiv(f'g.g{j}', f'nr.n * {LR_DEN}')} "
            f"AS BIGINT) AS w{j}"
            for j in range(_K)
        )
        stages.append(
            f"w{i} AS MATERIALIZED (SELECT {ups} FROM w{i - 1} w, g{i} g, nrows nr)"
        )
    return ",\n    ".join(stages)


def _sql_prefix(iters: int = LR_ITERS) -> str:
    return f"WITH {_SQL_FEATS},\n    {_sql_fit_chain(iters)}"


# The trained weights are SERVED model state (VERDICT r10 #6's
# governance, applied to a genuinely fitted artifact): _fitted routes
# through serving.ensure_trained_artifact, whose fingerprint is the
# documents parquet + every fit parameter — an unchanged corpus
# ATTACHES the published weights (zero training jobs, cross-session),
# a regenerated corpus refits and publishes a new version. The
# in-process memo below is keyed by that same source fingerprint, so
# even a mid-process fixture regeneration invalidates it.
_FIT_CACHE: dict[tuple, list[int]] = {}


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return quality_features_quantized(docs)


def _feature_semantics_token() -> str:
    """code_version_token over everything that pins the FEATURE
    SEMANTICS of the fit: the oracle's feature SQL (which interpolates
    SQL_NTOK / SQL_PUNCT_RATIO / SQL_QUALITY / the stopword list, so a
    change to any of them changes the string) and the Spark feature
    builder's source. VERDICT r11 #1b: without this token, weights
    published under one feature-code version fingerprint-match and get
    served to another — the coherence seam behind the round-11 red
    rows."""
    import inspect

    from hadoop_project_spark.serving import code_version_token

    return code_version_token(
        _SQL_FEATS, inspect.getsource(quality_features_quantized)
    )


_FIT_PARAMS = (
    f"it{LR_ITERS}:fq{FQ}:den{LR_DEN}:w{W}:"
    f"feat{len(LR_FEATURES)}:qs{QS_THRESHOLD}:"
    f"sem{_feature_semantics_token()}"
)


def _fitted(spark: SparkSession, sf_dir: str, feats: DataFrame) -> list[int]:
    import os

    from hadoop_project_spark.serving import (
        _sf_tag,
        ensure_trained_artifact,
        source_fingerprint,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    key = (sf_dir, source_fingerprint(src, extra=_FIT_PARAMS))
    if key not in _FIT_CACHE:
        # ensure_trained_artifact returns the weights IN EFFECT for
        # this process — when the fit runs here, the exact rows it
        # fitted (never a read-back another publisher could have
        # replaced mid-run: the round-11 red-row mechanism); when it
        # attaches, the live version's rows after values verification
        _t, rows = ensure_trained_artifact(
            spark,
            f"lr_quality_{_sf_tag(sf_dir)}",
            "feature STRING, wq BIGINT",
            src,
            _FIT_PARAMS,
            lambda: [
                (name, int(w))
                for name, w in zip(
                    LR_FEATURES, lr_fit(eager_pin(feats), iters=LR_ITERS)
                )
            ],
        )
        by_name = {feature: int(wq) for feature, wq in rows}
        _FIT_CACHE[key] = [by_name[name] for name in LR_FEATURES]
    return _FIT_CACHE[key]


@register(
    "quality_lr_train",
    priority=10,  # new in round 11 -> first driver window
    oracle=f"""
    {_sql_prefix()}
    SELECT f.feature, CAST(f.wq AS BIGINT) AS wq FROM (
      {" UNION ALL ".join(
          f"SELECT '{name}' AS feature, w{j} AS wq FROM w{LR_ITERS}"
          for j, name in enumerate(LR_FEATURES)
      )}
    ) f
    """,
    tags=("text", "quality", "ml", "training", "C2", "extension"),
)
def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED quality classifier's weights: full-batch
    hard-sigmoid logistic regression on fixed-point integer features
    (bias, saturating length, punctuation ratio, en-stopword density),
    distilling the rational-exact quality heuristic thresholded at its
    corpus median (the distill-the-teacher objective — an LLM-judge
    stand-in with a deterministic cross-engine label). One aggregate
    job per iteration, O(k) driver state; the oracle replays every
    gradient and every floored weight update, so the hash certifies
    the full fit — the training half of doc_quality_model_filter's
    frozen-logit deploy shape."""
    feats = _feats(spark, sf_dir)
    wq = _fitted(spark, sf_dir, feats)
    return spark.createDataFrame(
        [(name, int(w)) for name, w in zip(LR_FEATURES, wq)],
        "feature string, wq bigint",
    )


@register(
    "quality_lr_corpus_filter",
    priority=10,  # new in round 11 -> first driver window
    oracle=f"""
    {_sql_prefix()}
    SELECT f.doc_id, f.y,
           CAST({" + ".join(f"w.w{j} * f.x{j}" for j in range(_K))}
                AS BIGINT) AS score_q,
           ({" + ".join(f"w.w{j} * f.x{j}" for j in range(_K))}) >= 0
             AS admitted
    FROM feats f, w{LR_ITERS} w
    """,
    tags=("text", "quality", "ml", "model-filter", "extension"),
)
def quality_lr_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained classifier applied to the corpus: one frozen-weight
    projection per document (score_q = z in W units; admit ⇔ z ≥ 0 ⇔
    hard-sigmoid p ≥ 1/2). The deployment scan — no shuffle, no joins;
    at 100 TB this is the same shape as doc_quality_model_filter, with
    weights that came from the certified fit instead of hand-tuning."""
    feats = _feats(spark, sf_dir)
    wq = _fitted(spark, sf_dir, feats)
    return lr_score(feats, wq)


@register(
    "quality_lr_eval",
    priority=10,  # new in round 11 -> first driver window
    oracle=f"""
    {_sql_prefix()},
    scored AS (
      SELECT f.y,
             ({" + ".join(f"w.w{j} * f.x{j}" for j in range(_K))}) >= 0 AS a
      FROM feats f, w{LR_ITERS} w
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN a AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN NOT a AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN NOT a AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(SUM(CASE WHEN a = (y = 1) THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM scored
    """,
    tags=("text", "quality", "ml", "evaluation", "extension"),
)
def quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained classifier's confusion matrix + accuracy against its
    own training label — the measured-filter-quality number (the
    classifier twin of dedup_lsh_recall_eval / ann_recall_at_k: a
    model-based gate ships with a measured error rate, not a hope).
    One global aggregate over the scoring scan."""
    feats = _feats(spark, sf_dir)
    wq = _fitted(spark, sf_dir, feats)
    scored = lr_score(feats, wq)
    agg = scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            (F.col("admitted") & (F.col("y") == 1)).cast("long")
        ).alias("tp"),
        F.sum(
            (F.col("admitted") & (F.col("y") == 0)).cast("long")
        ).alias("fp"),
        F.sum(
            (~F.col("admitted") & (F.col("y") == 1)).cast("long")
        ).alias("fn"),
        F.sum(
            (~F.col("admitted") & (F.col("y") == 0)).cast("long")
        ).alias("tn"),
    )
    return agg.select(
        "n_docs",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("accuracy"),
    )
