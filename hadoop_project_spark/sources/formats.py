"""Columnar / interchange format connectors beyond parquet.

The reference reads text lines and CSV and writes text (SURVEY.md §2.1);
parquet is this engine's native table format (catalog.py). These
connectors round out the source/sink matrix a Spark engine user
expects:

* ORC — the other splittable columnar format; same predicate-pushdown /
  column-pruning behavior as parquet (Catalyst emits PushedFilters for
  both), useful when downstream consumers are Hive/Trino-centric.
* JSON (newline-delimited) — the interchange format for ingest/export.
  Scale note: JSON is ~5-10× the scan cost of parquet (no column
  pruning, full-text parse), so it's an EDGE format here — read it
  once, write parquet, query that. `read_json` therefore requires an
  explicit schema: schema inference is a full extra pass over 100 TB
  and silently widens types (int → bigint → double) between batches.

Avro would need the external spark-avro package, which this
environment doesn't ship; `read_avro` raises with that explanation
rather than pretending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Newline-delimited JSON export (one object per line — the format
    every ingest tool speaks). Timestamps serialize as ISO-8601 strings."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """NDJSON scan with a REQUIRED schema (see module docstring: schema
    inference is an extra full pass and type-unstable at scale)."""
    if schema is None:  # pragma: no cover - defensive
        raise ValueError("read_json requires an explicit schema at scale")
    return spark.read.schema(schema).json(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    raise NotImplementedError(
        "Avro needs the external spark-avro package (org.apache.spark:"
        "spark-avro); not shipped in this environment. Convert at the "
        "edge with any avro-cli → NDJSON, then read_json with a schema."
    )
