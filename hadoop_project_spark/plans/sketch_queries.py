"""Driver query for the count-min sketch heavy-hitter operator
(operators/sketch.py).

The oracle recomputes BOTH surfaces from scratch: the exact heavy-
hitter set (plain GROUP BY + threshold — certifying the sketch path's
no-false-negative guarantee end to end) AND the D x W sketch estimate
column itself (same row-salted md5 cell hashing in SQL — certifying
the sketch arithmetic, not just the final set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.functions.text import normalize_text
from hadoop_project_spark.operators import sketch as sk
from hadoop_project_spark.plans.registry import register
from hadoop_project_spark.plans.text_pipeline import SQL_NORM

# Relative threshold: keep bigrams with count >= 1.15x the mean
# per-distinct-bigram count (integer test: cnt * nd * 100 >= 115 * s).
HH_THRESH_NUM = 115
HH_THRESH_DEN = 100


@register(
    "heavy_hitter_bigrams",
    priority=15,
    oracle=f"""
    WITH toks AS (
      SELECT string_split({SQL_NORM}, ' ') AS l FROM documents
    ),
    pos AS (
      SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
      FROM toks WHERE len(l) >= 2
    ),
    bg AS (SELECT l[i] || ' ' || l[i + 1] AS key FROM pos),
    c AS (SELECT key, COUNT(*) AS c FROM bg GROUP BY key),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM c
    ),
    keycell AS (
      SELECT key, c, r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || key),
                                  1, 8)) AS UBIGINT)
               % {sk.CM_WIDTH} AS col
      FROM c CROSS JOIN (VALUES (0), (1), (2), (3)) rows_(r)
    ),
    cells AS (
      SELECT r, col, SUM(c) AS cc FROM keycell GROUP BY r, col
    ),
    est AS (
      SELECT k.key, MIN(ce.cc) AS est
      FROM keycell k JOIN cells ce USING (r, col)
      GROUP BY k.key
    )
    SELECT c.key AS key, CAST(c.c AS BIGINT) AS cnt,
           CAST(e.est AS BIGINT) AS est
    FROM c JOIN est e USING (key) CROSS JOIN tot
    WHERE c.c * tot.nd * {HH_THRESH_DEN} >= {HH_THRESH_NUM} * tot.total
    """,
    tags=("sketch", "heavy-hitters", "count-min", "extension"),
)
def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams with frequency >= 1.15x the per-bigram mean, found by the
    bounded-memory sketch-then-verify path (operators/sketch.py): a
    4 x 2048 count-min pass, candidate thresholding on the estimates
    (superset by construction), then an exact broadcast-semi-join verify
    pass. Output (key, cnt, est) with est >= cnt always."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(normalize_text("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    n = F.size("t") - F.lit(1)
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", F.lit(1), n),
                F.slice("t", F.lit(2), n),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram")
    )
    return sk.cm_heavy_hitters(
        bigrams, "bigram", HH_THRESH_NUM, HH_THRESH_DEN
    )
