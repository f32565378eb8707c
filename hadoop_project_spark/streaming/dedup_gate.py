"""Ingest-time near-duplicate gate: the MinHash-LSH band-key state as a
streaming admission filter.

The batch dedup family (operators/dedup.py) answers "which pairs in
this CORPUS are near-dups"; an ingestion pipeline asks the incremental
question — "is this NEW document a near-dup of anything we already
accepted?" — and must answer it per micro-batch without rescanning the
corpus. The state that makes that cheap is exactly the LSH index: the
accepted documents' (band, key) rows. Each micro-batch

  1. computes its docs' band keys (same minhash_signatures /
     lsh_band_keys as the batch path, so the collision semantics are
     identical to dedup_minhash_lsh's candidate stage);
  2. flags docs colliding with the ACCEPTED state, or with a
     lower-doc_id doc inside the same batch (deterministic tie-break,
     mirroring the batch path's doc_a < doc_b orientation);
  3. appends flag rows, and folds the batch's keys into the state via
     the same staging-swap publish as streaming/merge.py.

State size is O(accepted docs x NUM_BANDS) — the index, not the corpus;
at 100 TB the parquet state becomes the LSH table of a real feature
store, and the per-batch work is one broadcast-or-shuffle join keyed by
(band, key), never a scan of history. Flags are CANDIDATE-level (band
collision); a production gate would follow with the exact-Jaccard
verify on flagged pairs only, exactly as jaccard_verify does in batch.

tests/test_streaming.py proves multi-batch equivalence: the final
state equals the batch-computed band keys, and the flagged set equals
a post-hoc recomputation from the recorded batch roster.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from hadoop_project_spark.operators.dedup import (
    doc_shingles,
    lsh_band_keys,
    minhash_signatures,
)


def batch_band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) for a batch of documents — the exact batch
    pipeline, factored for the gate and its equivalence test."""
    return lsh_band_keys(minhash_signatures(doc_shingles(docs)))


def make_neardup_gate_sink(
    state_dir: str, flags_dir: str, roster_dir: str | None = None
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining the LSH state at ``state_dir``
    and appending (doc_id, batch_id) flag rows to ``flags_dir``.
    ``roster_dir`` (tests) additionally records every doc's batch id so
    equivalence can be recomputed post-hoc."""
    staging = state_dir + ".staging"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        keys = batch_band_keys(batch_df).persist()
        if roster_dir is not None:
            batch_df.select("doc_id").distinct().withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(roster_dir)
        state_exists = os.path.exists(state_dir)
        hits_state = (
            keys.join(
                spark.read.parquet(state_dir).select("band", "key"),
                ["band", "key"],
            ).select("doc_id")
            if state_exists
            else None
        )
        # within-batch collisions: lower doc_id wins, higher is flagged
        a, b = keys.alias("a"), keys.alias("b")
        hits_batch = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_id"))
        )
        flagged = (
            hits_batch if hits_state is None else hits_batch.union(hits_state)
        ).distinct()
        flagged.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(flags_dir)
        # fold this batch's keys into the accepted-state index
        new_state = keys.select("doc_id", "band", "key")
        if state_exists:
            new_state = spark.read.parquet(state_dir).unionByName(new_state)
        new_state.write.mode("overwrite").parquet(staging)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.replace(staging, state_dir)
        keys.unpersist()

    return sink
