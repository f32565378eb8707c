"""Multimodal (image/audio/video) column operators.

Model: media is an opaque `binary` column + typed metadata struct
(format, width/height or sample_rate/duration, channel count), the way
a 100 TB training corpus stores it in parquet row groups. The Spark
plumbing — schemas, Arrow-batched mapInPandas with bounded batch
sizes, partition-count control for memory-heavy decode — is real and
tested; the codec itself is pluggable because image/audio libraries
are not available in this environment:

* ``decoder=None``  → raises NotImplementedError (the explicit stub)
* ``decoder=fake_image_decoder`` → deterministic fake used in tests to
  validate batch shapes end-to-end.

At scale, decode is the memory-bound stage: keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (set per-call
here via config hint in docstring) and repartition so a batch of
decoded frames fits in executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpg|wav|mp4...
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

Decoder = Callable[[bytes, str], "list[float]"]


def fake_image_decoder(payload: bytes, fmt: str) -> list[float]:
    """Deterministic stand-in for a real decode→resize→embed stage:
    16 floats derived from the payload's sha256 — stable across runs,
    so tests can assert exact results through the Arrow boundary."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:16]]


def extract_features(
    media: DataFrame,
    decoder: Decoder | None = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched; the only
    Python-side stage in the engine, used exactly where SURVEY.md's
    rules allow it: semantics built-ins can't express).

    NOTE: real image/audio codecs are unavailable in this build;
    pass a decoder or get the explicit stub failure.
    """
    if decoder is None:
        raise NotImplementedError(
            "media decode requires a codec library (PIL/torchaudio/ffmpeg) "
            "not present in this environment; pass decoder=... "
            "(tests use fake_image_decoder)"
        )
    if batch_partitions:
        # decode is memory-bound: bound the rows per task
        media = media.repartition(batch_partitions)

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p if p is not None else b"", f or "")
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_dim": [len(f) for f in feats],
                    "features": feats,
                }
            )

    return media.mapInPandas(_map, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into
    (media_id, frame_ts_ms) rows from metadata alone — a pure JVM
    sequence/explode; the actual frame extraction would plug into
    extract_features on the exploded plan."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def audio_window_plan(
    media: DataFrame, window_ms: int = 400, hop_ms: int = 250
) -> DataFrame:
    """Audio analysis-window plumbing (the STFT/feature-window prep):
    expand each audio row into overlapping windows from metadata alone
    — (media_id, window_start_ms, n_samples) with the tail window
    clamped to the clip end. Pure JVM sequence/explode + integer
    arithmetic, no shuffle; the real PCM decode would plug into
    extract_features over these rows exactly as frames do for video.

    n_samples = (clamped window length in ms) × sample_rate / 1000,
    computed as exact integer floor-division so the plan is
    engine-deterministic.
    """
    from pyspark.sql import functions as F

    audio = media.filter(F.col("kind") == "audio")
    dur = F.col("meta.duration_ms")
    start = F.explode(
        F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(hop_ms))
    ).alias("window_start_ms")
    exploded = audio.select(
        "media_id", dur.alias("_dur"), F.col("meta.sample_rate").alias("_sr"), start
    )
    win_len = F.least(
        F.col("window_start_ms") + F.lit(window_ms), F.col("_dur")
    ) - F.col("window_start_ms")
    return exploded.select(
        "media_id",
        F.col("window_start_ms").cast("long").alias("window_start_ms"),
        F.floor(win_len * F.col("_sr") / F.lit(1000)).cast("long").alias("n_samples"),
    )
