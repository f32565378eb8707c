"""Pipeline-diagnostic queries: key-skew profiling (the measurement
that justifies the salting operators) and snapshot diffing (CDC-style
run-over-run comparison). Both register at 500 — their machinery's
in-window reps are the percentile and join families — and are
hash-verified by tests/test_oracle_parity.py every CI run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators.profile import (
    column_profile,
    sql_column_profile,
)
from hadoop_project_spark.operators.skew import key_skew_profile
from hadoop_project_spark.operators.snapshot import (
    diff_summary,
    snapshot_diff,
    sql_row_hash,
)
from hadoop_project_spark.plans.registry import register

# Deterministic synthetic "next snapshot" of orders: drop keys ≡ 0
# (mod 101), bump totalprice on keys ≡ 1 (mod 97), add shifted copies
# of keys ≡ 5 (mod 103). Constants are primes so the classes overlap
# minimally and every diff status is non-empty at every SF.
DROP_MOD, CHANGE_MOD, ADD_MOD, ADD_SHIFT = 101, 97, 103, 10_000_000

_HASH = sql_row_hash(["o_totalprice", "o_orderpriority"])


@register(
    "events_key_skew_profile",
    priority=500,
    oracle="""
    WITH pk AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_key_rows,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt) AS p50_key_rows,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY cnt) AS p99_key_rows,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS max_share,
           CAST(MAX(cnt) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE) AS skew_ratio
    FROM pk
    """,
    tags=("diagnostics", "skew", "extension"),
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key row-count distribution of events.user_id — n_keys, max,
    avg, exact p50/p99, hottest-key share and the max/avg straggler
    ratio that decides whether the salting operators pay for
    themselves."""
    events = load_table(spark, sf_dir, "events")
    return key_skew_profile(events, ["user_id"])


@register(
    "orders_snapshot_diff",
    priority=500,
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % {CHANGE_MOD} = 1
                  THEN o_totalprice + 1.00 ELSE o_totalprice END
               AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % {DROP_MOD} <> 0
      UNION ALL
      SELECT o_orderkey + {ADD_SHIFT}, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % {ADD_MOD} = 5
    ),
    o AS (SELECT o_orderkey, {_HASH} AS h FROM old),
    n AS (SELECT o_orderkey, {_HASH} AS h FROM new),
    j AS (
      SELECT CASE WHEN o.h IS NULL THEN 'added'
                  WHEN n.h IS NULL THEN 'removed'
                  WHEN o.h = n.h THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, COUNT(*) AS n_rows FROM j GROUP BY status
    """,
    tags=("diagnostics", "diff", "cdc", "extension"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff of orders against a deterministically mutated next
    version: (status, n_rows) for added/removed/changed/unchanged. Both
    engines construct the mutation independently and run their own
    full-outer hash diff — the hashes never cross engines, so only the
    diff SEMANTICS must agree. One keyed shuffle of (key, 16-byte
    hash); row payloads never cross an exchange."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    changed_price = F.when(
        F.col("o_orderkey") % CHANGE_MOD == 1, F.col("o_totalprice") + 1.00
    ).otherwise(F.col("o_totalprice"))
    new = (
        orders.where(F.col("o_orderkey") % DROP_MOD != 0)
        .withColumn("o_totalprice", changed_price)
        .unionByName(
            orders.where(F.col("o_orderkey") % ADD_MOD == 5).withColumn(
                "o_orderkey", F.col("o_orderkey") + ADD_SHIFT
            )
        )
    )
    diff = snapshot_diff(
        orders, new, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
    )
    return diff_summary(diff)


_PROF_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
_PROF_STR = ["l_returnflag", "l_linestatus"]


@register(
    "lineitem_column_profile",
    priority=500,
    oracle=sql_column_profile("lineitem", _PROF_NUM, _PROF_STR),
    tags=("diagnostics", "analyze", "stats", "extension"),
)
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column stats for five lineitem columns off ONE
    scan (a single wide aggregate unpivoted with stack): null counts,
    exact distinct counts, numeric min/max, string length bounds."""
    li = load_table(spark, sf_dir, "lineitem")
    return column_profile(li, _PROF_NUM, _PROF_STR)
