"""Snapshot diffing — CDC-style comparison of two versions of a keyed
table: which rows were added, removed, changed, or untouched between
pipeline runs.

The audit primitive behind incremental pipelines (did the rebuild
change anything it shouldn't have?) and dataset versioning (what moved
between corpus v1 and v2). Shape: both sides reduce to (key, row_hash)
at the scan — the diff join carries ONE hash column per row, never the
row payload — then a single full-outer join on the key decides the
status per key. At 100 TB that is scan + one keyed shuffle of
~16 bytes/row; payload width never crosses the exchange.

The row hash is md5 over the compare columns with an explicit NULL
sentinel and unit separator (`concat_ws` drops NULLs silently — two
rows differing only in which column is NULL must hash differently), so
the DuckDB oracle reproduces every hash bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# chr(1)-framed sentinel (NUL would be illegal in a SQL string literal;
# the SQL twin rebuilds these with chr())
NULL_SENTINEL = "\x01null\x01"
SEP = "\x1f"


def row_hash(cols: list[str]) -> Column:
    """md5 over the named columns, NULL-safe and order-sensitive."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in cols
    ]
    joined = reduce(lambda a, b: F.concat(a, F.lit(SEP), b), parts)
    return F.md5(joined)


def sql_row_hash(cols: list[str]) -> str:
    """The identical hash in DuckDB SQL (oracle twin of row_hash). The
    sentinel/separator contain control bytes that can't sit in a SQL
    string literal, so the SQL builds them with chr()."""
    sent = "(chr(1) || 'null' || chr(1))"
    parts = [f"COALESCE(CAST({c} AS VARCHAR), {sent})" for c in cols]
    sep = " || chr(31) || "
    return f"md5({sep.join(parts)})"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-key diff status between two snapshots:
    (key..., status ∈ {added, removed, changed, unchanged}).

    Precondition: ``key_cols`` identify rows uniquely in each snapshot.
    Both sides are projected to key + row_hash before the single
    full-outer join — the only shuffle, keyed and AQE-splittable.
    """
    o = old.select(*key_cols, row_hash(compare_cols).alias("_h_old"))
    n = new.select(*key_cols, row_hash(compare_cols).alias("_h_new"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_rows) rollup of a snapshot_diff result."""
    return diff.groupBy("status").agg(F.count("*").alias("n_rows"))
