"""Table/column statistics profiling — the ANALYZE-TABLE analog that
feeds optimizer decisions (broadcast thresholds, bucketing counts) and
data-quality dashboards: per-column null counts, exact distinct counts,
numeric min/max, string length bounds.

Single-scan shape: ONE aggregate computes every column's stats (Spark
plans the multi-distinct via Expand — one pass over the data, ~N×
intermediate rows for N distinct aggregates), then a `stack` unpivot
reshapes the 1-row-wide result into one row per column. At 100 TB the
exact distinct counts are the knob to relax: swap `countDistinct` for
`approx_count_distinct` (the sketch whose accuracy this engine already
driver-verifies in `approx_distinct_users_daily`) and the Expand
disappears; everything else is a plain streaming aggregate.

All output stats are integers/doubles — no value-to-string casts cross
the engine boundary, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(
    df: DataFrame, numeric_cols: list[str], string_cols: list[str]
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_num, max_num,
     min_len, max_len) — the length bounds NULL for numeric columns and
    the numeric bounds NULL for string columns."""
    aggs = [F.count("*").alias("_n")]
    for c in numeric_cols + string_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
    for c in string_cols:
        aggs.append(F.min(F.length(c)).cast("long").alias(f"{c}__minlen"))
        aggs.append(F.max(F.length(c)).cast("long").alias(f"{c}__maxlen"))
    wide = df.agg(*aggs)

    stack_parts = []
    for c in numeric_cols:
        stack_parts.append(
            f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max, "
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"
        )
    for c in string_cols:
        stack_parts.append(
            f"'{c}', {c}__nulls, {c}__ndv, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), {c}__minlen, {c}__maxlen"
        )
    n = len(numeric_cols) + len(string_cols)
    stacked = wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(column_name, n_nulls, n_distinct, min_num, max_num, "
            "min_len, max_len)"
        ),
    )
    return stacked.select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_len", "max_len",
    )


def sql_column_profile(
    table: str, numeric_cols: list[str], string_cols: list[str]
) -> str:
    """DuckDB oracle twin: UNION ALL of per-column stat rows."""
    selects = []
    for c in numeric_cols:
        selects.append(
            f"""SELECT '{c}' AS column_name,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
            CAST(MIN({c}) AS DOUBLE) AS min_num,
            CAST(MAX({c}) AS DOUBLE) AS max_num,
            CAST(NULL AS BIGINT) AS min_len,
            CAST(NULL AS BIGINT) AS max_len
            FROM {table}"""
        )
    for c in string_cols:
        selects.append(
            f"""SELECT '{c}' AS column_name,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
            CAST(NULL AS DOUBLE) AS min_num,
            CAST(NULL AS DOUBLE) AS max_num,
            CAST(MIN(length({c})) AS BIGINT) AS min_len,
            CAST(MAX(length({c})) AS BIGINT) AS max_len
            FROM {table}"""
        )
    return " UNION ALL ".join(selects)
