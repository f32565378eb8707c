"""The ANN index's LSM segment path (streaming/ann_segments.py): the
schema-agnostic core's contracts — idempotent replay, base ∪ segments
serving state, compaction equivalence, snapshot-consistent retirement
— instantiated for the PQ codes relation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadoop_project_spark.catalog import load_table
from hadoop_project_spark.operators import similarity as sim
from hadoop_project_spark.streaming.ann_segments import (
    compact_codes_segments,
    encode_codes,
    make_codes_segment_sink,
    read_codes_segments,
)
from hadoop_project_spark.streaming.index_segments import compacted_through

K = 10
N_QUERIES = 8


def _probe_rows(enc, queries):
    books = sim.make_pq_codebooks()
    cents = sim.make_coarse_centroids(16, 64, 7)
    df = sim.ivfpq_topk_over(
        enc, queries, k=K, cents=cents, books=books, n_probe=4
    )
    return sorted(map(tuple, df.collect()))


def _enc_inline(emb):
    return encode_codes(emb).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "codes"
    )


def _seg_enc(spark, seg_root, table=None):
    seg = read_codes_segments(spark, seg_root).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "codes"
    )
    if table is None:
        return seg
    base = spark.table(table).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "codes"
    )
    return base.unionByName(seg)


def test_codes_segment_replay_and_base_union(spark, sf_dir, tmp_path):
    """Replayed batches publish nothing new, and the between-
    compactions serving state (base table ∪ live segments) answers the
    IVF-PQ probe exactly like the one-shot inline encode."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    seg_root = str(tmp_path / "segs")
    sink = make_codes_segment_sink(seg_root, publish="manifest")
    # base = even vectors, compacted; segments = odd vectors, live
    sink(emb.filter(F.col("vec_id") % 2 == 0), 0)
    table = "t_ann_seg_base"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert compact_codes_segments(spark, seg_root, table) == table
    sink(emb.filter(F.col("vec_id") % 4 == 1), 1)
    sink(emb.filter(F.col("vec_id") % 4 == 3), 2)
    n_manifests = len(os.listdir(os.path.join(seg_root, "manifests")))
    sink(emb.filter(F.col("vec_id") % 4 == 1), 1)  # replay: no-op
    assert (
        len(os.listdir(os.path.join(seg_root, "manifests"))) == n_manifests
    )
    got = _probe_rows(_seg_enc(spark, seg_root, table), queries)
    want = _probe_rows(_enc_inline(emb), queries)
    assert got == want


def test_codes_compaction_equivalence_and_idle_noop(spark, sf_dir, tmp_path):
    """Compacting segments (with an overlapping replay among them)
    yields a codes table probe-identical to the one-shot encode; a
    second compaction tick with no new segments is a no-op that leaves
    the watermark alone."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    seg_root = str(tmp_path / "segs")
    sink = make_codes_segment_sink(seg_root)
    for b in range(3):
        sink(emb.filter(F.col("vec_id") % 3 == b), b)
    table = "t_ann_seg_compacted"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert compact_codes_segments(spark, seg_root, table) == table
    hi = compacted_through(seg_root)
    assert hi == 2
    got = _probe_rows(
        spark.table(table).select(
            F.col("vec_id").alias("neighbor_id"), "cell", "codes"
        ),
        queries,
    )
    want = _probe_rows(_enc_inline(emb), queries)
    assert got == want
    # all segments retired -> live relation is empty, tick is a no-op
    assert read_codes_segments(spark, seg_root).count() == 0
    assert compact_codes_segments(spark, seg_root, table) is None
    assert compacted_through(seg_root) == hi


def test_codes_stream_ingest_matches_oneshot(spark, sf_dir, tmp_path):
    """A REAL readStream (file source, availableNow, checkpointed)
    through the codes segment sink: the published segments union to
    exactly the one-shot encode (multiset equality), across a genuinely
    multi-batch run."""
    from collections import Counter

    from hadoop_project_spark.streaming.index_segments import (
        _published_segments,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = str(tmp_path / "emb_seg_src")
    emb.repartition(4).write.mode("overwrite").parquet(src)

    seg_root = str(tmp_path / "segments")
    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(make_codes_segment_sink(seg_root))
        .option("checkpointLocation", str(tmp_path / "seg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(_published_segments(seg_root)) >= 2  # genuinely multi-batch

    def multiset(df):
        return Counter(
            (r["vec_id"], tuple(r["codes"]), r["cell"]) for r in df.collect()
        )

    assert multiset(read_codes_segments(spark, seg_root)) == multiset(
        encode_codes(emb)
    )
