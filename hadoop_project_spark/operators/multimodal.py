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


def wav_samples(payload: bytes) -> "tuple[int, int, tuple]":
    """Parse a RIFF/WAVE PCM16 container into (sample_rate, n_channels,
    samples) — the shared parsing core of wav_decoder and
    audio_fingerprint. Pure-stdlib chunk walk with word-alignment,
    `fmt ` + `data` chunk extraction, little-endian int16 decode — the
    container layout from the public RIFF spec."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sr = ch = bits = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            afmt, ch, sr, _rate, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if afmt != 1:
                raise ValueError(f"unsupported WAVE format code {afmt}")
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # RIFF chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only PCM16 supported, got {bits}")
    return sr, ch, struct.unpack(f"<{len(data) // 2}h", data)


def wav_decoder(payload: bytes, fmt: str) -> list[float]:
    """REAL codec through the pluggable seam (parsing core:
    wav_samples). No external library, so it ships in this environment
    as the working alternative to the NotImplementedError stub.

    Features (6 floats): sample_rate, n_channels, n_samples,
    sample_sum, sample_min, sample_max — integer-valued by
    construction, so they survive the float32 feature column exactly
    for clips ≤ 2^24 absolute sum (the synthetic fixture stays ≤ 2^21)
    and an SQL oracle can recompute them bit-for-bit."""
    sr, ch, samples = wav_samples(payload)
    if not samples:
        return [float(sr), float(ch), 0.0, 0.0, 0.0, 0.0]
    return [
        float(sr),
        float(ch),
        float(len(samples)),
        float(sum(samples)),
        float(min(samples)),
        float(max(samples)),
    ]


def pack_wav_pcm16(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    """Inverse of wav_decoder for fixtures/tests: pack int16 samples
    into a minimal RIFF/WAVE container, with a junk odd-length LIST
    chunk between fmt and data so round-trip tests exercise the
    parser's chunk walk and word-alignment, not just the happy path."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    junk = b"LIST" + struct.pack("<I", 3) + b"pad" + b"\x00"  # odd size + pad
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def bmp_pixels(payload: bytes) -> "object":
    """Parse a 24 bpp uncompressed Windows BMP into a top-down
    row-major (h, w, 3) uint8 numpy array of (r, g, b) pixels — the
    shared parsing core of bmp_decoder and image_dhash. Handles both
    row orders (positive height = bottom-up, negative = top-down) and
    the 4-byte row padding.

    Normalises with numpy stride slicing (BMP stores BGR within each
    pixel): the vectorized path is bit-identical to a per-pixel loop
    while decoding ~50× faster; decode is the per-row hot loop inside
    the Arrow batches, so its constant is what the mapInPandas stage's
    throughput scales with."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24bpp supported, got {bpp}bpp")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (3 * w + 3) & ~3  # rows padded to 4 bytes
    if data_off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    buf = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = buf.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    # BGR on disk -> (r, g, b)
    return img[:, :, ::-1]


def bmp_decoder(payload: bytes, fmt: str) -> list[float]:
    """REAL image codec through the pluggable seam: a pure-stdlib
    Windows BMP (BITMAPINFOHEADER, 24 bpp uncompressed) parser — the
    container layout from the public BMP spec. Handles the two row
    orders (positive height = bottom-up, negative = top-down) and the
    4-byte row padding, normalising to top-down row-major pixels.

    Features (10 floats, every one integer-valued so the float32
    feature column is lossless and an SQL oracle can recompute them
    bit-for-bit):

      width, height, n_pixels,
      r_sum, g_sum, b_sum           (per-channel byte sums),
      px_min, px_max                (over all channel bytes),
      ds_count, ds_sum              (2x nearest-neighbour downsample:
                                     pixels at even x AND even y;
                                     count and sum over all channels)

    The downsample features depend on pixel COORDINATES, not just the
    multiset of bytes — a hash-green oracle row certifies the row-order
    flip and stride arithmetic, not just byte accounting."""
    import numpy as np

    img = bmp_pixels(payload)  # (h, w, 3) rgb
    w, h = img.shape[1], img.shape[0]
    r_ch = img[:, :, 0].astype(np.int64)
    g_ch = img[:, :, 1].astype(np.int64)
    b_ch = img[:, :, 2].astype(np.int64)
    ds = img[::2, ::2]  # 2x nearest-neighbour downsample grid
    return [
        float(w),
        float(h),
        float(w * h),
        float(r_ch.sum()),
        float(g_ch.sum()),
        float(b_ch.sum()),
        float(img.min()),
        float(img.max()),
        float(ds.shape[0] * ds.shape[1]),
        float(ds.astype(np.int64).sum()),
    ]


def pack_bmp24(
    pixels: "list[tuple[int, int, int]]",
    width: int,
    height: int,
    top_down: bool = False,
) -> bytes:
    """Inverse of bmp_decoder for fixtures/tests: pack top-down
    row-major (r, g, b) pixels into a minimal 24 bpp BMP. Default
    writes the common bottom-up row order (positive height) so
    round-trip tests exercise the decoder's row flip; ``top_down=True``
    writes negative height for the other branch. Rows are padded to
    4 bytes per the spec, which is non-trivial whenever width % 4 != 0.
    """
    import struct

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height (top-down row-major)")
    stride = (3 * width + 3) & ~3
    pad = b"\x00" * (stride - 3 * width)
    rows = []
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    data_off = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        24,
        0,
        len(pixel_data),
        2835,
        2835,
        0,
        0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(pixel_data), 0, 0, data_off)
    return file_hdr + info + pixel_data


# Named codec registry: callers (and the CLI/driver surface) select a
# decoder by format string; extract_features also accepts a raw
# callable. The fake codec stays the deterministic test stand-in; wav
# and bmp are the shipping stdlib codecs; richer image/video codecs
# plug in here when their libraries exist in the deployment.
CODECS: "dict[str, Decoder]" = {
    "fake": fake_image_decoder,
    "wav": wav_decoder,
    "bmp": bmp_decoder,
}

# Pixel-level codec registry for operators that need the raster, not a
# feature vector (perceptual hashing below); same pluggable seam.
PIXEL_CODECS: "dict[str, Callable[[bytes], object]]" = {
    "bmp": bmp_pixels,
}

# dHash geometry: sample to a 9x8 grayscale grid, compare horizontally
# adjacent cells -> 8x8 = 64 comparisons; keep the first DHASH_BITS
# (60 — the house bit width shared with the MinHash/SimHash families,
# keeping every code comfortably inside a signed BIGINT on any engine).
DHASH_GRID_W = 9
DHASH_GRID_H = 8
DHASH_BITS = 60

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("dhash", T.LongType(), False),
    ]
)


def dhash60(img) -> int:
    """The 60-bit difference hash of one (h, w, 3) uint8 rgb array:
    integer grayscale (r+g+b)//3, nearest-neighbour sample onto the
    9x8 grid (src = (dst * size) // grid — floor arithmetic, so any
    engine computes identical sample coordinates), bit (y*8+x) set when
    grid[y][x] > grid[y][x+1]. Pure integer pipeline end to end — the
    property that lets a SQL oracle re-derive whole codes exactly."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    gray = img.astype(np.int64).sum(axis=2) // 3
    sx = (np.arange(DHASH_GRID_W, dtype=np.int64) * w) // DHASH_GRID_W
    sy = (np.arange(DHASH_GRID_H, dtype=np.int64) * h) // DHASH_GRID_H
    grid = gray[np.ix_(sy, sx)]  # (8, 9)
    bits = grid[:, :-1] > grid[:, 1:]  # (8, 8) row-major comparisons
    code = 0
    for pos, b in enumerate(bits.flatten()):
        if pos >= DHASH_BITS:
            break
        if b:
            code |= 1 << pos
    return code


def image_dhash(media: DataFrame, decoder: str = "bmp") -> DataFrame:
    """Perceptual hash per image: decode via the pixel codec seam and
    emit (media_id, width, height, dhash) — the Arrow-batched
    mapInPandas stage feeding the banded Hamming near-dup join
    (plans/multimodal_queries.image_dhash_neardup). One pass over the
    payload column; output is O(#images) tiny rows, so everything
    downstream of decode is cheap at any corpus size."""
    if decoder not in PIXEL_CODECS:
        raise KeyError(
            f"unknown pixel codec {decoder!r}; registered: "
            f"{sorted(PIXEL_CODECS)}"
        )
    pix = PIXEL_CODECS[decoder]

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = pix(payload if payload is not None else b"")
                out["media_id"].append(int(mid))
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
                out["dhash"].append(dhash60(img))
            yield pd.DataFrame(out)

    return media.mapInPandas(_map, schema=DHASH_SCHEMA)


# Audio fingerprint geometry: the energy-profile difference code —
# split the clip into AFP_WINDOWS equal sample windows (floor-division
# assignment), sum |sample| per window, bit w set when energy[w] >
# energy[w+1]. The 1-D twin of dHash, same 60-bit house width.
AFP_WINDOWS = 61

AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
    ]
)


def audio_fingerprint60(samples) -> int:
    """60-bit energy-profile fingerprint of one PCM16 clip: window
    w = (i * AFP_WINDOWS) // n for sample i (exact floor arithmetic),
    energy = Σ|sample| per window, bit w = energy[w] > energy[w+1].
    Integer end to end — SQL-oracle-exact like dhash60.

    Short-clip contract (ADVICE r11 #4): for n < AFP_WINDOWS the
    sample-less windows have energy 0 and STILL participate in every
    bit comparison — a clip with fewer samples than windows gets a
    sparse-but-defined code (n = 0 degenerates to code 0). A SQL
    replay must therefore densify the window axis (generate the full
    0..AFP_WINDOWS-1 series and COALESCE missing energies to 0) rather
    than join only the windows that received samples, which would
    silently drop bit positions. This regime is cross-engine certified
    by tests/test_multimodal.py::test_audio_fingerprint60_short_clips
    _match_sql_oracle; the corpus fixture's clips are all
    >= 240 samples, so the driver query never depends on it."""
    n = len(samples)
    e = [0] * AFP_WINDOWS
    for i, v in enumerate(samples):
        e[(i * AFP_WINDOWS) // n] += abs(int(v))
    code = 0
    for w in range(DHASH_BITS):
        if e[w] > e[w + 1]:
            code |= 1 << w
    return code


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Fingerprint per audio clip: decode via the RIFF parsing core and
    emit (media_id, n_samples, fingerprint) — the Arrow-batched
    mapInPandas stage feeding the banded Hamming near-dup join. Same
    shape and cost profile as image_dhash."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "fingerprint": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _sr, _ch, samples = wav_samples(
                    payload if payload is not None else b""
                )
                out["media_id"].append(int(mid))
                out["n_samples"].append(len(samples))
                out["fingerprint"].append(audio_fingerprint60(samples))
            yield pd.DataFrame(out)

    return media.mapInPandas(_map, schema=AFP_SCHEMA)


def banded_hamming_pairs(
    codes: DataFrame,
    code_col: str,
    ham_t: int,
    n_bands: int = 4,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-dup pairs under Hamming distance over 60-bit codes, WITHOUT
    all-pairs work: split each code into ``n_bands`` equal bit bands,
    candidates are pairs sharing at least one exact band (the SimHash/
    LSH banding trick — the band key is the only shuffle key), verified
    with bit_count(xor) <= ham_t. A pair at distance d misses all bands
    only if every band holds >= 1 differing bit, so recall degrades
    gracefully and is exactly mirrorable in SQL. Returns
    (media_a, media_b, hamming)."""
    from pyspark.sql import functions as F

    band_bits = DHASH_BITS // n_bands
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(code_col, band_bits * b)
                .bitwiseAND(F.lit(2**band_bits - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    keys = codes.select(
        F.col(id_col), F.col(code_col), F.explode(entries).alias("e")
    ).select(
        F.col(id_col),
        F.col(code_col),
        F.col("e.band").alias("band"),
        F.col("e.key").alias("key"),
    )
    a = keys.select(
        "band", "key",
        F.col(id_col).alias("media_a"), F.col(code_col).alias("ha"),
    )
    b = keys.select(
        "band", "key",
        F.col(id_col).alias("media_b"), F.col(code_col).alias("hb"),
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "ha", "hb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("int"))
        .filter(F.col("hamming") <= ham_t)
        .select("media_a", "media_b", "hamming")
    )


def extract_features(
    media: DataFrame,
    decoder: "Decoder | str | None" = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched; the only
    Python-side stage in the engine, used exactly where SURVEY.md's
    rules allow it: semantics built-ins can't express).

    ``decoder`` is a callable or a CODECS registry name ("wav" ships as
    a working stdlib codec; "fake" is the deterministic test codec).
    Image/video decode still requires a codec library (PIL/ffmpeg) not
    present in this environment — None keeps the explicit stub failure.
    """
    if isinstance(decoder, str):
        if decoder not in CODECS:
            raise KeyError(
                f"unknown codec {decoder!r}; registered: {sorted(CODECS)}"
            )
        decoder = CODECS[decoder]
    if decoder is None:
        raise NotImplementedError(
            "media decode requires a codec library (PIL/torchaudio/ffmpeg) "
            "not present in this environment; pass decoder=... — a codec "
            "name from CODECS ('wav' is a shipping stdlib RIFF parser) "
            "or a callable (tests use fake_image_decoder)"
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
