"""Behavioral-sequence analytics over the events stream.

First-class product-analytics surface: the first-order Markov
transition matrix over per-user event sequences — the building block
for path analysis, next-action prediction baselines, and funnel
discovery. Extends the secondary-sort shape of SURVEY.md §2 O2 (the
reference's composite-key sort — final/src/main/java/flight/
FlightCompare.java) with LEAD semantics and a conditional-probability
normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.plans.registry import register


@register(
    "event_transition_matrix",
    priority=15,
    oracle="""
    WITH t AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n_trans) AS n_from FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n_trans AS BIGINT) AS n_trans,
           CAST(c.n_trans AS DOUBLE) / CAST(t2.n_from AS DOUBLE) AS p_trans
    FROM c JOIN tot t2 USING (from_type)
    """,
    tags=("behavior", "markov", "window", "O2", "extension"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts and conditional
    probabilities between consecutive events of each user.

    One partitioned LEAD window (shuffle keyed by user_id — never a
    global sort), one count aggregate over the tiny type x type matrix,
    and a broadcast join for the row normalization. Ties inside a
    user's sequence break on event_id, so the transition stream is
    deterministic on both engines. p_trans is a single correctly-
    rounded division of exact integers.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n_trans").cast("long").alias("n_trans"),
            (
                F.col("n_trans").cast("double")
                / F.col("n_from").cast("double")
            ).alias("p_trans"),
        )
    )
