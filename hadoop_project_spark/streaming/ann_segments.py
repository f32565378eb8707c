"""LSM-style segment ingest for the STORED ANN index: per-batch PQ
code segments + compaction into the cell-partitioned serving table.

Embedding pipelines ingest continuously (every new document batch
arrives with vectors), but the served IVF-PQ layout
(serving.ensure_served_ivfpq — parquet PARTITIONED BY coarse cell) is
O(corpus) to rewrite, exactly like the term-bucketed inverted index.
Same answer, same machinery: this module instantiates the
schema-agnostic LSM core of streaming/index_segments.py for the codes
relation (vec_id, codes, cell) —

* each micro-batch of vectors is ENCODED ONCE (cell assignment + PQ
  codes, the same expressions the one-shot build uses) and published
  as one immutable segment (batch_id-idempotent, rename or manifest
  protocol — the sink core is shared, so the object-store-safe path
  and the crash/replay contracts come for free);
* probes between compactions run ivfpq_topk_over on base ∪ LIVE
  segments — the segment leg misses the base's partition pruning (it
  is row-group-filtered on cell instead) but is bounded by ingest
  recency, the standard LSM read-amplification trade;
* compaction folds base + live segments into the partitioned codes
  table with DISTINCT over (vec_id, codes, cell) — vec_id is the
  primary key and (codes, cell) are pure functions of the vector, so
  replayed/overlapping segments self-heal.

Stream ≡ batch: the segment-ingested + compacted codes table answers
IVF-PQ probes identically to the one-shot encode — driver-hash-
certified by `ann_ivfpq_segment_compaction` (same DuckDB oracle as
ann_topk_ivfpq) and asserted in tests/test_ann_segments.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_project_spark.operators.similarity import (
    ivf_cell,
    make_coarse_centroids,
    make_pq_codebooks,
    pq_codes,
)
from hadoop_project_spark.streaming.index_segments import (
    compact_segments_into,
    make_segment_sink,
    read_segments,
)

CODES_SCHEMA = "vec_id bigint, codes array<int>, cell int"
_CODES_COLUMNS = ("vec_id", "codes", "cell")


def encode_codes(
    batch_df: DataFrame,
    books: list[list[list[float]]] | None = None,
    cents: list[list[float]] | None = None,
    n_cells: int = 16,
    cell_seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One vector micro-batch → its codes relation (vec_id, codes,
    cell): the same cell/code expressions the one-shot served build
    runs (serving.ensure_served_ivfpq), so segments and base are
    byte-compatible by construction."""
    books = books if books is not None else make_pq_codebooks()
    cents = (
        cents
        if cents is not None
        else make_coarse_centroids(n_cells, dim, cell_seed)
    )
    return batch_df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        pq_codes(vec_col, books).alias("codes"),
        ivf_cell(vec_col, cents).alias("cell"),
    )


def make_codes_segment_sink(
    seg_root: str,
    publish: str = "rename",
    **encode_kwargs,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function appending one immutable PQ-codes segment
    per vector micro-batch — the ANN instantiation of
    make_segment_sink (idempotent batch_id publishes, rename or
    manifest protocol)."""
    return make_segment_sink(
        seg_root, lambda b: encode_codes(b, **encode_kwargs), publish
    )


def read_codes_segments(
    spark: SparkSession, seg_root: str, include_retired: bool = False
) -> DataFrame:
    """LIVE (not-yet-compacted) code segments as one (vec_id, codes,
    cell) relation — the segment leg of a between-compactions probe."""
    return read_segments(
        spark, seg_root, include_retired=include_retired, schema=CODES_SCHEMA
    )


def compact_codes_segments(
    spark: SparkSession,
    seg_root: str,
    table: str,
    n_cells: int = 16,
    served_root: str | None = None,
) -> str | None:
    """Fold live code segments (and any existing base) into the
    cell-partitioned codes layout — the ANN instantiation of
    compact_segments_into, inheriting its snapshot-consistent
    watermark, idle no-op, lost-base rebuild and self-healing re-run
    contracts, and (round 11) its VERSIONED serving publish: the base
    is the same external, attach-by-DDL, partition-pruned layout
    serving.ensure_served_ivfpq builds, so a streamed-into codes index
    is probe-able from any later session. Returns the table name, or
    None when nothing folded (the idle tick still attaches the live
    version)."""
    from hadoop_project_spark.serving import (
        LAYOUT_VERSION,
        codes_served_table,
    )

    tables = [codes_served_table(table)]

    def write_base(fold: DataFrame, staging: str) -> None:
        # one writer task per cell -> one file per partition dir
        (
            fold.repartition(n_cells, F.col("cell"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(tables[0].location(staging))
        )

    compacted = compact_segments_into(
        spark,
        seg_root,
        schema=CODES_SCHEMA,
        columns=_CODES_COLUMNS,
        tables=tables,
        write_base=write_base,
        served_root=served_root,
        fp_extra=f"v{LAYOUT_VERSION}:cells{n_cells}",
    )
    return table if compacted else None
