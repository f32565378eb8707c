"""Declarative data-quality expectations (the Deequ/Great-Expectations
analog) and referential-integrity audits.

Both operators are spec-driven with the oracle GENERATED from the same
spec objects the Spark plan compiles from — the pattern the PII layer
established (operators/pii.py): an edit to a check can never silently
diverge from its verification SQL.

Physical shape:

* ``check_expectations`` — ONE wide aggregate over the table computes
  every check's metric (Spark plans multi-distinct via Expand, single
  scan), then a ``stack`` unpivot emits one row per check with the
  pass verdict applied to the metric AFTER aggregation, identically in
  both engines (double compare against a literal threshold).
* ``fk_orphan_report`` — per foreign-key edge one LEFT ANTI join
  (child ⋈ parent) counted, unioned into an audit table. Anti joins
  shuffle on the key (broadcast when the parent is a dim), so each
  edge is one linear pass at any scale; no driver state beyond the
  edge list.

The reference has no validation surface (SURVEY.md §2 stops at its
compute operators); this is extension surface: a 100 TB ingest without
expectation gates ships corrupt partitions silently.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_OPS = {"<=", ">=", "=="}


@dataclass(frozen=True)
class Expectation:
    """One check: an aggregate metric (as a Spark Column builder AND a
    DuckDB aggregate expression over the same table) plus a pass
    predicate ``metric <op> threshold``."""

    name: str
    # thunk, not a Column: classic-mode Columns need an active
    # SparkSession, and specs are declared at module import time.
    spark_metric: Callable[[], Column]
    sql_metric: str
    op: str
    threshold: float

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unsupported op {self.op!r}")


def _passed(metric: Column, op: str, threshold: float) -> Column:
    if op == "<=":
        return metric <= F.lit(threshold)
    if op == ">=":
        return metric >= F.lit(threshold)
    return metric == F.lit(threshold)


def check_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """→ (check_name, metric, threshold, passed) one row per check,
    from a single scan."""
    wide = df.agg(
        *[
            e.spark_metric().cast("double").alias(f"m_{i}")
            for i, e in enumerate(expectations)
        ]
    )
    parts = ", ".join(
        f"'{e.name}', m_{i}, CAST({e.threshold!r} AS DOUBLE)"
        for i, e in enumerate(expectations)
    )
    stacked = wide.select(
        F.expr(
            f"stack({len(expectations)}, {parts}) AS "
            "(check_name, metric, threshold)"
        )
    )
    verdict = F.lit(False)
    for e in expectations:
        verdict = F.when(
            F.col("check_name") == e.name,
            _passed(F.col("metric"), e.op, e.threshold),
        ).otherwise(verdict)
    return stacked.select(
        "check_name", "metric", "threshold", verdict.alias("passed")
    )


def sql_expectations(table: str, expectations: list[Expectation]) -> str:
    """DuckDB oracle twin generated from the same specs."""
    selects = []
    for e in expectations:
        cmp = {"<=": "<=", ">=": ">=", "==": "="}[e.op]
        selects.append(
            f"""SELECT '{e.name}' AS check_name,
            CAST({e.sql_metric} AS DOUBLE) AS metric,
            CAST({e.threshold!r} AS DOUBLE) AS threshold,
            CAST({e.sql_metric} AS DOUBLE) {cmp} {e.threshold!r} AS passed
            FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)


@dataclass(frozen=True)
class FkEdge:
    """child.child_key must reference parent.parent_key."""

    child: str
    child_key: str
    parent: str
    parent_key: str

    @property
    def name(self) -> str:
        return f"{self.child}.{self.child_key}->{self.parent}"


def fk_orphan_report(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    edges: list[FkEdge],
) -> DataFrame:
    """→ (fk_name, n_child, n_orphans, passed) one row per FK edge."""
    out = None
    for e in edges:
        child = tables[e.child].select(F.col(e.child_key).alias("_k"))
        parent = tables[e.parent].select(F.col(e.parent_key).alias("_k"))
        orphans = child.join(parent, "_k", "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        row = child.agg(F.count("*").alias("n_child")).crossJoin(orphans).select(
            F.lit(e.name).alias("fk_name"),
            "n_child",
            "n_orphans",
            (F.col("n_orphans") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sql_fk_orphan_report(edges: list[FkEdge]) -> str:
    """DuckDB oracle twin from the same edge list."""
    selects = []
    for e in edges:
        orphans = (
            f"(SELECT COUNT(*) FROM {e.child} c WHERE NOT EXISTS "
            f"(SELECT 1 FROM {e.parent} p "
            f"WHERE p.{e.parent_key} = c.{e.child_key}))"
        )
        selects.append(
            f"""SELECT '{e.name}' AS fk_name,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM {e.child}) AS n_child,
            CAST({orphans} AS BIGINT) AS n_orphans,
            {orphans} = 0 AS passed"""
        )
    return "\nUNION ALL\n".join(selects)
