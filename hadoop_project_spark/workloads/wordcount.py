"""WordCount family (WordCount1 + WordCount2 variants).

Reference: tokenize → (word, 1) → combiner → sum
(WordCount1/src/main/java/WordCount.java:22-53). The combiner,
in-map tally and in-task tally variants (A2-A4,
WordCount2/src/main/java/WordCountInMapTally.java:32-47,
WordCountInTaskTally.java:27-56) exist in the reference purely as
partial-aggregation strategies; Spark's HashAggregateExec always runs
the partial/final split, so all four variants share one plan here.

The custom first-char partitioner (R1, WordCount2/src/main/java/
WordCount.java:59-72) affects only row placement, not results; its
analog is `repartition(n, F.lower(F.substring('word', 1, 1)))`, exposed
as an option for output-file-layout parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hadoop_project_spark.functions.text import tokenize

TOKEN_FILTER_RE = "^[mnopqMNOPQ]"  # WordCount2/src/main/java/WordCount.java:34


def word_count(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """(word, count) over whitespace tokens (P1 + A1 + O1)."""
    return (
        lines.select(F.explode(tokenize(value_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def word_count_filtered(
    lines: DataFrame,
    value_col: str = "value",
    partition_by_first_char: int | None = None,
) -> DataFrame:
    """WordCount2 semantics: only tokens matching ^[m-qM-Q] (P2).

    ``partition_by_first_char=n`` reproduces the reference's custom
    partitioner placement (R1) — cosmetic for results, but it shows the
    repartition-on-expression operator.
    """
    wc = (
        lines.select(F.explode(tokenize(value_col)).alias("word"))
        .filter(F.col("word").rlike(TOKEN_FILTER_RE))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if partition_by_first_char:
        wc = wc.repartition(
            partition_by_first_char, F.lower(F.substring("word", 1, 1))
        )
    return wc
