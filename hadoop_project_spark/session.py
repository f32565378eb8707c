"""SparkSession factory.

Replaces the reference's per-job ``Job.getInstance(conf)`` driver setup
(e.g. WordCount1/src/main/java/WordCount.java:48-59) with one resident
session: the ~40 s/job setup overhead the reference identified as its main
bottleneck (BASELINE.md) simply does not exist here.

Local mode is for tests/bench only; every config below is chosen to also
be sane on a multi-executor cluster (AQE, skew-join handling, sensible
shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hadoop-project-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or ``*``.
    On a real cluster the caller passes master via spark-submit and these
    configs still apply.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Low static shuffle parallelism for local scale; AQE coalesces
        # further. On a 1000-executor cluster this would be ~2-3x cores.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it
        # as long when this is set (converted back in catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NOTE on split planning: it works on COMPRESSED file bytes, so
        # a 6 MB text-heavy parquet (185 MB decompressed) plans only 2
        # splits under the 4 MB default open-cost and a CPU-heavy
        # transform above it would serialize on 2 cores. Lowering
        # spark.sql.files.openCostInBytes globally was measured and
        # REJECTED: it recovers those transforms but taxes every scan
        # of every small table with 5-6x more task overhead (+15 s
        # across the 142-query sf0.1 bench). The targeted fix is
        # execution.widen_for_compute at the expensive text operators.
        # Honor sortBy ordering when reading bucketed tables whose
        # buckets each hold ONE file (off by default since Spark 3.0
        # because multi-file buckets can't guarantee it). Every bucketed
        # writer here repartitions to exactly n_buckets on the bucket
        # column first, so the one-file-per-bucket precondition holds by
        # construction — and the iterative SMJ consumers (the bucketed
        # PageRank twin) exist precisely to NOT re-sort the edge
        # relation every iteration.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
