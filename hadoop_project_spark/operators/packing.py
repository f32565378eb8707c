"""Context-window preparation for LLM training corpora: overlapping
token-window chunking and streaming-concat sequence packing.

Two operators the reference has no analogue for (its text surface stops
at tokenization — WordCount1/src/main/java/WordCount.java:24); both are
standard stages of a pretraining data pipeline:

* **Chunking** — split each document into fixed-size token windows with
  overlap (RAG / long-doc preprocessing). Pure per-document column
  expressions: the plan is scan → project → explode with NO shuffle, so
  it scales linearly with input splits at any corpus size.

* **Sequence packing** — concatenate the corpus in a deterministic
  order and assign every document its global token offset, from which
  the fixed-length context windows ("bins") it lands in follow by
  integer division. The global offset is an exact distributed
  prefix-sum, NOT a single-task ``Window.orderBy``: range-partition on
  the order key, Arrow-batched running sum per partition, then
  O(#partitions) driver-held partial sums broadcast back as offsets —
  the same two-pass shape as operators/ranking.py, parallelism
  preserved end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from hadoop_project_spark.functions.text import normalize_text

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24
PACK_BUDGET = 256  # tokens per packed context window


def chunk_starts(toks: Column, window: int, stride: int) -> Column:
    """1-based start positions of the token windows covering ``toks``.

    Regular starts 1, 1+stride, … up to L = max(n-window+1, 1), plus a
    final start at L when the strides don't land on it exactly — so the
    last window always ends on the last token. With stride ≤ window
    (the overlap regime) every token is covered; stride > window is the
    gappy sampled-windows regime (valid for sketching long docs) and
    skips tokens between windows by construction.
    Built without array_distinct (its output order is unspecified in
    some engines); the list is constructed duplicate-free so both Spark
    and the SQL oracle agree on element ORDER, which defines chunk_id.
    """
    last = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    regular = F.sequence(F.lit(1), last, F.lit(stride))
    return F.when((last - 1) % stride == 0, regular).otherwise(
        F.concat(regular, F.array(last))
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Output: doc_id, chunk_id (0-based, in stream order), chunk_start
    (1-based token index), n_chunk_tokens, chunk_md5 (fingerprint of the
    space-joined window — keeps result width O(1) regardless of window).

    The token array is MATERIALIZED into a column before slicing so the
    normalize+split runs once per document, not once per chunk (see
    functions/text.py::shingles_from_tokens for the measured pitfall).
    """
    toks = F.split(normalize_text(text_col), " ")
    with_toks = docs.select("doc_id", toks.alias("_toks"))
    starts = chunk_starts(F.col("_toks"), window, stride)
    exploded = with_toks.select(
        "doc_id", "_toks", F.posexplode(starts).alias("chunk_id", "chunk_start")
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start"), window)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def with_global_offset(
    df: DataFrame, order_col: str, weight_col: str, out_col: str = "start_offset"
) -> DataFrame:
    """Exact global prefix-sum: each row's offset = sum of ``weight_col``
    over all rows strictly before it in ``order_col`` order.

    Equivalent to ``SUM(w) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING AND
    1 PRECEDING)`` but distributed: the naive window is one task holding
    the whole corpus. Here partition i of the range exchange holds keys
    strictly below partition i+1, a running counter computes the local
    prefix within each partition, and the per-partition totals (
    O(#partitions) longs, driver-held like the K-Means centroid state)
    become broadcast offsets. Two passes over the one range exchange —
    the price of exactness, parallelism = #partitions throughout.
    """
    arranged = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(arranged.schema.fields)
        + [T.StructField("_local_before", T.LongType(), False)]
    )

    def running(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = 0
        for pdf in batches:
            pdf = pdf.copy()
            w = pdf[weight_col].astype("int64")
            ends = w.cumsum() + acc
            pdf["_local_before"] = ends - w
            acc = int(ends.iloc[-1]) if len(pdf) else acc
            yield pdf

    # Eager localCheckpoint BEFORE the totals pass: both actions (the
    # collect below and the returned DataFrame) must read ONE
    # materialized range partitioning. repartitionByRange samples its
    # bounds, and with partial samples (the at-scale regime) two
    # executions can disagree on row→_pid placement, corrupting the
    # broadcast offsets. A lost block raises instead of re-sampling.
    local = arranged.mapInPandas(running, schema=out_schema).localCheckpoint(
        eager=True
    )
    totals = {
        r["_pid"]: r["tot"]
        for r in local.groupBy("_pid")
        .agg(F.sum(weight_col).alias("tot"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += int(totals[pid])
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local_before")).cast("long"))
        .drop("_pid", "_offset", "_local_before")
    )


def pack_bins(
    docs_with_tokens: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Streaming-concat packing: documents are concatenated in
    ``order_col`` order and cut into fixed ``budget``-token context
    windows; each document reports the first/last window it occupies and
    whether it straddles a window boundary (GPT-style pretraining
    packing, where documents may span bins). Integer arithmetic only —
    oracle-exact.
    """
    out = with_global_offset(docs_with_tokens, order_col, tokens_col)
    start = F.col("start_offset")
    end = start + F.col(tokens_col) - 1
    return out.select(
        order_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        start,
        F.floor(start / budget).cast("long").alias("bin_first"),
        F.floor(end / budget).cast("long").alias("bin_last"),
        (F.floor(start / budget) != F.floor(end / budget)).alias("spans_boundary"),
    )
