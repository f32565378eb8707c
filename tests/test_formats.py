"""ORC / NDJSON connector round-trips on the driver test tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.sources import formats


def test_orc_roundtrip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    path = str(tmp_path / "li_orc")
    formats.write_orc(li, path)
    back = formats.read_orc(spark, path)
    assert back.schema == li.schema
    a = li.agg(F.sum("l_quantity"), F.count("*")).first()
    b = back.agg(F.sum("l_quantity"), F.count("*")).first()
    assert a == b


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    """ORC scans must get the same pushdown treatment as parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_orc")
    formats.write_orc(li, path)
    df = formats.read_orc(spark, path).filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    # column pruning: the read schema carries only the projected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    path = str(tmp_path / "docs_json")
    formats.write_json(docs, path)
    back = formats.read_json(spark, path, "doc_id bigint, source string, lang string, text string")
    assert back.count() == docs.count()
    # text containing newlines/quotes survives NDJSON escaping
    a = sorted(r["text"] for r in docs.collect())
    b = sorted(r["text"] for r in back.collect())
    assert a == b


def test_json_partitioned_write(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_part")
    formats.write_json(docs, path, partition_by=["lang"])
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("lang=")]
    assert len(dirs) >= 2
    back = formats.read_json(spark, path, "doc_id bigint, n_chars bigint, lang string")
    assert back.count() == docs.count()


def test_avro_roundtrip_where_deployed(spark, sf_dir, tmp_path):
    """Avro is an external Spark module (deployment property): the
    roundtrip runs wherever `--packages org.apache.spark:spark-avro`
    is on the classpath and skips where it is not — and the capability
    probe must agree with what the engine actually does."""
    from hadoop_project_spark.catalog import load_table

    if not formats.avro_supported(spark):
        with pytest.raises(Exception, match="avro|AVRO|data source"):
            formats.read_avro(spark, str(tmp_path / "nope"))
        pytest.skip("spark-avro module not deployed in this session")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_avro")
    formats.write_avro(docs, path)
    back = formats.read_avro(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )
