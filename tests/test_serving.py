"""Serve/build split (VERDICT r9 #3): the stored inverted index lives
as EXTERNAL bucketed parquet at a stable warehouse path; a fresh
session attaches it with one DDL statement (no data touched) and keeps
every bucket-local / bucket-pruned plan property of the build session.
Staleness is fingerprint-governed: a changed source fixture forces a
rebuild, an unchanged one makes ensure_served_index metadata-only."""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import functions as F

from hadoop_project_spark.operators import invindex as ix
from hadoop_project_spark.serving import ensure_served_index

PHRASES = ["table scan", "hash join"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _data_mtimes(loc: str) -> dict[str, int]:
    return {
        f: os.stat(os.path.join(loc, f)).st_mtime_ns
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    }


def _tmp_sf(sf_dir, tmp_path) -> str:
    """A private sf_dir copy so the staleness leg can mutate the
    fixture (the real testdata is read-only)."""
    d = tmp_path / "srv_sf"
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        d / "documents.parquet",
    )
    return str(d)


def test_served_index_attach_reuse_and_staleness(spark, sf_dir, tmp_path):
    from hadoop_project_spark.catalog import load_table

    sf = _tmp_sf(sf_dir, tmp_path)
    docs = load_table(spark, sf, "documents")

    # first call: builds the external layout and registers the tables
    prefix = ensure_served_index(spark, sf)
    pt, dt = ix.index_table_names(prefix)
    expected = _rows(ix.phrase_search_stats(docs, PHRASES))
    assert _rows(
        ix.phrase_search_stats_over(spark.table(pt), PHRASES)
    ) == expected

    loc = spark.sql(f"DESCRIBE EXTENDED {pt}").filter(
        "col_name='Location'"
    ).collect()[0]["data_type"]
    ploc = loc.removeprefix("file:")
    before = _data_mtimes(ploc)
    assert len(before) == ix.POSTINGS_BUCKETS  # one file per bucket

    # fresh-session twin: catalog forgets, files stay; the second call
    # ATTACHES (no rewrite — every data file untouched)
    spark.sql(f"DROP TABLE {pt}")
    spark.sql(f"DROP TABLE {dt}")
    assert ensure_served_index(spark, sf) == prefix
    assert _data_mtimes(ploc) == before
    assert _rows(
        ix.phrase_search_stats_over(spark.table(pt), PHRASES)
    ) == expected

    # the attached table keeps the build session's plan properties
    probe_plan = _plan(
        ix.phrase_search_stats_over(spark.table(pt), ["table scan"])
    )
    pruned = re.findall(
        r"SelectedBucketsCount: (\d+) out of (\d+)", probe_plan
    )
    assert pruned and all(int(s) < int(t) for s, t in pruned), probe_plan
    dir_plan = _plan(ix.index_directory_over(spark.table(pt)))
    assert "Exchange" not in dir_plan, dir_plan
    assert "Bucketed: true" in dir_plan

    # staleness: a regenerated fixture fingerprints differently and
    # forces a rebuild whose probes see the NEW corpus
    new_src = str(tmp_path / "docs_regen.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(new_src)
    os.remove(os.path.join(sf, "documents.parquet"))
    shutil.move(new_src, os.path.join(sf, "documents.parquet"))
    assert ensure_served_index(spark, sf) == prefix
    docs2 = load_table(spark, sf, "documents")
    assert _rows(
        ix.phrase_search_stats_over(spark.table(pt), PHRASES)
    ) == _rows(ix.phrase_search_stats(docs2, PHRASES))

    # versioned publish: the rebuild lands in a NEW version dir (the
    # catalog re-points) and the old version's files are UNTOUCHED —
    # a reader mid-scan on the previous version never loses its files
    loc2 = spark.sql(f"DESCRIBE EXTENDED {pt}").filter(
        "col_name='Location'"
    ).collect()[0]["data_type"].removeprefix("file:")
    assert loc2 != ploc
    assert _data_mtimes(ploc) == before

    # the layout root holds exactly the CURRENT pointer, the live
    # version and the retained previous version — no staging residue,
    # no unbounded version pileup
    layout_root = os.path.dirname(os.path.dirname(ploc))
    entries = sorted(os.listdir(layout_root))
    vdirs = [e for e in entries if e.startswith("v-")]
    assert "CURRENT" in entries and len(vdirs) == 2, entries
    assert [e for e in entries if e not in vdirs and e != "CURRENT"] == []
    with open(os.path.join(layout_root, "CURRENT")) as fh:
        assert os.path.join(layout_root, fh.read().strip()) == os.path.dirname(
            loc2
        )


def test_served_pagerank_graph_attach_reuse(spark, sf_dir):
    """The PageRank graph layout serves across catalog resets: drop
    the attached tables, re-ensure, and the data files are reused
    (attach is metadata-only) with identical iteration results."""
    from hadoop_project_spark.plans.registry import all_queries
    from hadoop_project_spark.serving import ensure_served_pagerank_graph

    et, nt = ensure_served_pagerank_graph(spark, sf_dir)
    loc = spark.sql(f"DESCRIBE EXTENDED {et}").filter(
        "col_name='Location'"
    ).collect()[0]["data_type"].removeprefix("file:")
    before = _data_mtimes(loc)
    expected = _rows(all_queries()["part_pagerank_served"].build(spark, sf_dir))
    spark.sql(f"DROP TABLE {et}")
    spark.sql(f"DROP TABLE {nt}")
    assert ensure_served_pagerank_graph(spark, sf_dir) == (et, nt)
    assert _data_mtimes(loc) == before
    assert _rows(
        all_queries()["part_pagerank_served"].build(spark, sf_dir)
    ) == expected
    # parity with the build-per-run twin (same oracle, same plan)
    assert _rows(
        all_queries()["part_pagerank_bucketed"].build(spark, sf_dir)
    ) == expected


def test_served_bm25_matches_in_session_scoring(spark, sf_dir, tmp_path):
    from hadoop_project_spark.catalog import load_table

    sf = _tmp_sf(sf_dir, tmp_path)
    docs = load_table(spark, sf, "documents")
    prefix = ensure_served_index(spark, sf)
    queries = ["table scan", "hash join merge"]
    assert _rows(
        ix.bm25_topk_stored(spark, prefix, queries, 10)
    ) == _rows(ix.bm25_topk(docs, queries, 10))


def test_served_ivfpq_prunes_partitions_and_matches_inline(spark, sf_dir):
    """The served IVF-PQ probe must (a) return exactly what the inline
    twin computes and (b) scan only the probed cell PARTITIONS — the
    plan's FileScan carries the cell IN (...) as PartitionFilters, so
    pruning happens at planning, not as a post-scan filter."""
    from hadoop_project_spark.plans import all_queries

    specs = all_queries()
    served = specs["ann_topk_ivfpq_served"].build(spark, sf_dir)
    inline = specs["ann_topk_ivfpq"].build(spark, sf_dir)
    assert _rows(served) == _rows(inline)
    plan = _plan(served)
    scan = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "cell" in scan and "IN" in scan.upper(), scan
