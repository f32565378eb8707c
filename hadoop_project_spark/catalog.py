"""Table catalog over the driver-provided parquet test tables.

The reference hand-rolled its storage layer as HBase tables with
byte-encoded cells and composite string row keys
(Flight2/src/main/java/hw4/HPopulate.java:40-44, 92-97;
final/src/main/java/program/KConfig.java:6-29). Here a "table" is a
parquet path with a real schema; Catalyst gets column pruning and
predicate pushdown into the scan for free (the reference had to build
this by hand with HBase SingleColumnValueFilters —
Flight2/src/main/java/hw4/HCompute.java:256-267).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes storage quirks so downstream plans
    see clean types.

    ``events.ts`` has shipped in two physical encodings across driver
    regenerations: parquet TIMESTAMP(NANOS) (read as bigint nanoseconds
    under ``spark.sql.legacy.parquet.nanosAsLong``, truncated to
    microseconds here — the same floor-truncation DuckDB applies), and
    microsecond TIMESTAMP_NTZ (pyspark 4.x reads it as ``timestamp_ntz``,
    which Spark 4 refuses to cast to BIGINT or feed to ``unix_micros``).
    The catalog owns type normalization — every consumer sees a plain
    session-zone ``timestamp``; the session zone is pinned to UTC
    (session.py) so NTZ→LTZ is a value-preserving relabel and the DuckDB
    oracle (which reads the same file as naive TIMESTAMP) agrees.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the driver's
    DuckDB-side view registration so SQL plans read the same names)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
