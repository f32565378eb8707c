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

* Avro — the row-oriented interchange format; Spark ships it as an
  EXTERNAL module (`org.apache.spark:spark-avro_2.13`, added via
  ``--packages`` at submit time), so availability is a deployment
  property, not a code property. The connectors below call the real
  datasource; ``avro_supported`` probes the session once so callers
  (and CI) can branch instead of crashing — the roundtrip test runs
  wherever the module is deployed and skips where it is not.
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


_AVRO_FQCN = "org.apache.spark.sql.avro.AvroFileFormat"


def avro_supported(spark: SparkSession) -> bool:
    """Whether this deployment has the avro format classes (one
    classpath lookup, no jobs)."""
    try:
        spark._jvm.Class.forName(_AVRO_FQCN)
        return True
    except Exception:  # noqa: BLE001 - absent class surfaces as Py4JError
        return False


def _avro_format(spark: SparkSession) -> str:
    """Resolve the avro datasource for this deployment. Spark 4 ships
    the avro classes inside spark-sql but does NOT list the short name
    in its DataSourceRegister services (the format stays "external"),
    so the short-name lookup fails even though the implementation is
    present — the fully-qualified format class works there AND under a
    --packages deployment. Where the classes are genuinely absent,
    fall through to the short name so Spark raises its own
    deployment-guide hint."""
    return _AVRO_FQCN if avro_supported(spark) else "avro"


def write_avro(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Avro export (splittable, block-compressed, schema travels in
    the file) — the row-oriented interchange sibling of write_json."""
    w = df.write.mode("overwrite").format(_avro_format(df.sparkSession))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan. Like JSON this is an EDGE format at 100 TB —
    row-oriented storage defeats column pruning, so land it to parquet
    once and query that."""
    return spark.read.format(_avro_format(spark)).load(path)
