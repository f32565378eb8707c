"""Execution-shape shim behavior (hadoop_project_spark/execution.py):
the tracked-pin release contract and the widen already-wide guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_project_spark import execution as ex
from hadoop_project_spark.catalog import load_table


def test_pin_release_contract(spark, sf_dir):
    """Every shim persist is tracked; release_pins() unpersists them
    all and empties the registry."""
    ex.release_pins()  # clean slate (other tests may have pinned)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = ex.pin(docs)
    b = ex.eager_pin(docs.select((F.col("doc_id") * 2).alias("x")))
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    n = ex.release_pins()
    assert n >= 2
    assert not a.storageLevel.useMemory
    assert not b.storageLevel.useMemory
    assert ex.release_pins() == 0  # registry drained


def test_widen_skips_already_wide_scan(spark, tmp_path):
    """A many-file input whose packed-split estimate reaches the target
    parallelism is NOT repartitioned (ADVICE r7: the already-wide no-op
    guarantee), while a single-file input in the work band still is."""
    target = spark.sparkContext.defaultParallelism
    wide_dir = str(tmp_path / "wide")
    # enough files that files*openCost alone crosses target*maxPartitionBytes
    spark.range(2_000_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).repartition(2 * target).write.parquet(wide_dir)
    wide = spark.read.parquet(wide_dir).select("id", "pad")
    est = ex.plan_size_bytes(wide)
    assert est >= ex.SHIM_MIN_WORK_BYTES  # in the widen work band
    out = ex.widen_for_compute(wide)
    assert out is wide  # guard fired: no exchange inserted

    narrow_dir = str(tmp_path / "narrow")
    spark.range(2_000_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(narrow_dir)
    narrow = spark.read.parquet(narrow_dir).select("id", "pad")
    if ex.plan_size_bytes(narrow) >= ex.SHIM_MIN_WORK_BYTES:
        out2 = ex.widen_for_compute(narrow)
        assert out2 is not narrow  # single file in the band: widened
