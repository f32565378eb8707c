"""MERGE INTO (upsert) as a relational composition.

Spark without a table format (Delta/Iceberg) has no MERGE statement;
the equivalent plan is a full-outer join on the merge keys followed by
per-column resolution:

* matched              → the update expression (default: source wins)
* not matched          → insert the source row
* not matched by source → keep the target row

That is exactly the join Delta Lake's merge executes under the hood for
a non-pruned merge (a shuffle join keyed on the merge keys), so the
cost model carries to 100 TB unchanged: one co-partitioned shuffle of
target and source, AQE skew-split on hot keys, no driver state. Key
presence is tracked with literal marker columns rather than null
checks on data columns, so null-valued keys or columns can never be
misread as "row absent".

The reference has no write-path analog (its sinks are append-only HBase
puts — SURVEY.md §2.1 S6/S7); this is part of the training-data
extension surface: incremental corpus refresh (re-crawl upserts) and
metric-table maintenance are merge workloads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

_T_MARK = "__merge_t_present"
_S_MARK = "__merge_s_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    updates: dict[str, Callable[[Column, Column], Column]] | None = None,
    status_col: str | None = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    ``updates`` maps a column name to ``fn(target_col, source_col)``
    for matched rows (e.g. additive merge of running aggregates);
    columns not listed resolve as "source wins". ``status_col``, if
    given, appends 'updated' / 'inserted' / 'unchanged' per row — the
    audit column a governed pipeline writes so a merge is explainable
    after the fact.
    """
    updates = updates or {}
    data_cols = [c for c in target.columns if c not in keys]
    if set(data_cols) != set(c for c in source.columns if c not in keys):
        raise ValueError("target/source schemas must agree outside the keys")

    t = target.withColumn(_T_MARK, F.lit(1)).alias("t")
    s = source.withColumn(_S_MARK, F.lit(1)).alias("s")
    joined = t.join(s, on=keys, how="full_outer")

    matched = F.col(f"t.{_T_MARK}").isNotNull() & F.col(
        f"s.{_S_MARK}"
    ).isNotNull()
    inserted = F.col(f"t.{_T_MARK}").isNull()

    out_cols: list[Column] = [F.col(k) for k in keys]
    for c in data_cols:
        tc, sc = F.col(f"t.{c}"), F.col(f"s.{c}")
        upd = updates[c](tc, sc) if c in updates else sc
        out_cols.append(
            F.when(matched, upd).when(inserted, sc).otherwise(tc).alias(c)
        )
    if status_col:
        out_cols.append(
            F.when(matched, F.lit("updated"))
            .when(inserted, F.lit("inserted"))
            .otherwise(F.lit("unchanged"))
            .alias(status_col)
        )
    return joined.select(*out_cols)
