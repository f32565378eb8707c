"""DuckDB-as-oracle comparison, mirroring the driver's correctness gate:
run the Spark plan and the ANSI-SQL twin on the same parquet, then
compare row count + column names + order-insensitive values.

The engine's plans are designed so values match *exactly* (decimal
internal arithmetic, explicit output casts); the comparator still allows
a 1e-9 relative tolerance on floats to keep the local gate honest about
what "equal" means across two engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession


class OracleMismatch(AssertionError):
    pass


@dataclass
class CompareResult:
    name: str
    rows: int
    ok: bool
    detail: str = ""


def _duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from hadoop_project_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_sorted(cols, rows):
    # sort columns by name (driver behavior), then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _values_equal(a, b, rel_tol=1e-9) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=rel_tol, abs_tol=1e-12)
    return str(a) == str(b)


def compare_to_oracle(
    spark: SparkSession,
    df: DataFrame,
    sql: str,
    sf_dir: str,
    name: str = "query",
) -> CompareResult:
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    con = _duckdb_connection(sf_dir)
    try:
        rel = con.sql(sql)
        duck_cols = list(rel.columns)
        duck_rows = [tuple(r) for r in rel.fetchall()]
    finally:
        con.close()

    s_cols, s_rows = _rows_sorted(spark_cols, spark_rows)
    d_cols, d_rows = _rows_sorted(duck_cols, duck_rows)

    if s_cols != d_cols:
        raise OracleMismatch(f"{name}: columns differ spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        raise OracleMismatch(
            f"{name}: row count differs spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
            if not _values_equal(sv, dv):
                raise OracleMismatch(
                    f"{name}: row {i} col {c} differs spark={sv!r} duckdb={dv!r}\n"
                    f"  spark row:  {sr}\n  duckdb row: {dr}"
                )
    return CompareResult(name=name, rows=len(s_rows), ok=True)
