"""The reference's own workloads, re-keyed onto the driver test tables
so the DuckDB oracle can verify them at every scale factor.

(The byte-parity versions over flight/pickup-shaped fixtures live in
hadoop_project_spark/workloads/; these registry entries prove the same
operator shapes on `documents`/`events`.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.execution import widen_for_compute
from hadoop_project_spark.functions.numeric import dec2
from hadoop_project_spark.functions.text import tokenize
from hadoop_project_spark.plans.registry import register


# ---------------------------------------------------------------------------
# WordCount family (P1 tokenize, A1 sum-per-key with automatic partial
# aggregation — the combiner of WordCount1/src/main/java/WordCount.java:53
# is Spark's HashAggregate partial/final split, always on; the
# in-map/in-task tally variants A2-A4 are subsumed by the same machinery).
# ---------------------------------------------------------------------------
@register(
    "word_count",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (
      SELECT UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("text", "P1", "A1", "A2", "A3", "A4"),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # widen the raw text projection: the tokenize regex is the CPU
    # stage (round-8 slope audit: r2 4.3x from a split-starved sf1
    # scan, the same signature as the winnowing/tfidf cases)
    widened = widen_for_compute(docs.select("text"))
    return (
        widened.select(F.explode(tokenize("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "word_count_filtered",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (
      SELECT UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
      FROM documents
    )
    WHERE word <> '' AND REGEXP_MATCHES(word, '^[mnopqMNOPQ]')
    GROUP BY word
    """,
    tags=("text", "P1", "P2", "A1", "F2", "R1"),
)
def word_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts restricted to the reference's `^[mnopqMNOPQ].*` filter
    (WordCount2/src/main/java/WordCount.java:34)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .filter(F.col("word") != "")
        .filter(F.col("word").rlike("^[mnopqMNOPQ]"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Flight1 two-leg self-join (J1 repartition equi-join + J2 theta residual
# + A5 global count/avg — PLAIN.java:68-208), re-keyed as a
# view→purchase conversion funnel on events: join on (user, day), keep
# pairs where the view strictly precedes the purchase.
# ---------------------------------------------------------------------------
@register(
    "two_leg_conversion",
    oracle="""
    SELECT
      COUNT(*) AS n_pairs,
      CAST(SUM(CAST(v.value AS DECIMAL(18,2)) + CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*) AS avg_combined_value
    FROM (SELECT user_id, CAST(ts AS DATE) AS d, ts, value
          FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, CAST(ts AS DATE) AS d, ts, value
          FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.d = p.d AND v.ts < p.ts
    """,
    tags=("join", "J1", "J2", "A5", "P8"),
)
def two_leg_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join of the events table on (user_id, day) with a theta
    residual (view.ts < purchase.ts), folded to a global count + average
    — the exact shape of the ORD→X→JFK flight join (PLAIN.java:175-208):
    equi-keys carry the shuffle, the range predicate is a cheap post-join
    residual, and the two Hadoop counters become one agg."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.to_date("ts").alias("d"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.to_date("ts").alias("p_d"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    pairs = views.join(
        purchases,
        (views.user_id == purchases.p_user_id)
        & (views.d == purchases.p_d)
        & (views.v_ts < purchases.p_ts),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        (
            F.sum(dec2("v_value") + dec2("p_value")).cast("double") / F.count("*")
        ).alias("avg_combined_value"),
    )
