"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
fake decode, frame-sample expansion, and the explicit codec stub."""

from __future__ import annotations

import pytest

from hadoop_project_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_image_decoder,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", "png", b"\x89PNG-fake-1", (64, 64, None, None)),
        (2, "image", "jpg", b"\xff\xd8-fake-2", (128, 96, None, None)),
        (3, "audio", "wav", b"RIFF-fake", (None, None, 16000, 2500)),
        (4, "video", "mp4", b"ftyp-fake", (640, 480, None, 3500)),
        (5, "image", "png", None, (8, 8, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_is_explicit(media_df):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media_df, decoder=None)


def test_fake_decode_roundtrip(media_df):
    feats = extract_features(media_df, decoder=fake_image_decoder).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 3, 4, 5}
    assert all(r["feat_dim"] == 16 for r in feats)
    by_id = {r["media_id"]: list(r["features"]) for r in feats}
    # deterministic: recompute outside Spark
    import math
    exp = fake_image_decoder(b"\x89PNG-fake-1", "png")
    assert all(
        math.isclose(a, b, rel_tol=1e-6) for a, b in zip(by_id[1], exp)
    )
    # null payload handled (empty bytes path)
    assert by_id[5] == pytest.approx(
        fake_image_decoder(b"", "png"), rel=1e-6
    )


def test_frame_sample_plan(media_df):
    frames = frame_sample_plan(media_df, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in frames)
    assert got == [(4, 0), (4, 1000), (4, 2000), (4, 3000)]


def test_audio_windows_tail_clamped(spark):
    from pyspark.sql import functions as F

    from hadoop_project_spark.operators.multimodal import audio_window_plan

    media = spark.createDataFrame(
        [(1, "audio", 1000, 16000), (2, "audio", 300, 8000), (3, "video", 1000, 16000)],
        "media_id long, kind string, duration_ms int, sample_rate int",
    ).select(
        "media_id", "kind",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("sample_rate"),
            F.col("duration_ms"),
        ).alias("meta"),
    )
    rows = audio_window_plan(media, window_ms=400, hop_ms=250).collect()
    by_key = {(r.media_id, r.window_start_ms): r.n_samples for r in rows}
    # clip 1: starts 0,250,500,750; tails clamp to 1000ms end
    assert by_key[(1, 0)] == 400 * 16  # full window
    assert by_key[(1, 750)] == 250 * 16  # clamped to 1000
    # clip 2: starts 0,250; 8kHz
    assert by_key[(2, 0)] == 300 * 8  # whole clip shorter than window
    assert by_key[(2, 250)] == 50 * 8
    # video rows excluded
    assert not any(k[0] == 3 for k in by_key)


# ------------------------------------------------------------ wav codec


def test_wav_roundtrip_exact():
    """pack → decode recovers rate/channels/count/sum/min/max exactly,
    through the junk LIST chunk and its word-alignment pad."""
    from hadoop_project_spark.operators.multimodal import (
        pack_wav_pcm16,
        wav_decoder,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    payload = pack_wav_pcm16(samples, sample_rate=8000)
    feats = wav_decoder(payload, "wav")
    assert feats == [
        8000.0, 1.0, float(len(samples)), float(sum(samples)),
        -32768.0, 32767.0,
    ]


def test_wav_decoder_rejects_garbage():
    from hadoop_project_spark.operators.multimodal import wav_decoder

    with pytest.raises(ValueError):
        wav_decoder(b"not a wav", "wav")
    with pytest.raises(ValueError):
        wav_decoder(b"RIFF\x00\x00\x00\x00JUNK", "wav")


def test_codec_registry_and_stub():
    """extract_features resolves codec names; None keeps the explicit
    stub failure; unknown names fail loudly."""
    from hadoop_project_spark.operators import multimodal as mm

    assert mm.CODECS["wav"] is mm.wav_decoder
    assert mm.CODECS["fake"] is mm.fake_image_decoder
    with pytest.raises(KeyError):
        mm.extract_features(None, decoder="nope")


def test_wav_features_through_arrow(spark):
    """The wav codec through the real mapInPandas path: decoded
    features match a local decode of the same payloads."""
    from hadoop_project_spark.operators.multimodal import (
        extract_features,
        pack_wav_pcm16,
        wav_decoder,
    )

    rows = [
        (i, "audio", "wav", pack_wav_pcm16([i * 100 - 50, -i, i], 8000))
        for i in range(5)
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, format string, payload binary"
    )
    got = {
        r.media_id: r.features
        for r in extract_features(media, decoder="wav").collect()
    }
    for i, _, _, payload in rows:
        assert got[i] == wav_decoder(payload, "wav")


# ------------------------------------------------------------ bmp codec


def _bmp_expected(pix, w, h):
    rs = sum(p[0] for p in pix)
    gs = sum(p[1] for p in pix)
    bs = sum(p[2] for p in pix)
    mn = min(min(p) for p in pix)
    mx = max(max(p) for p in pix)
    ds = [(x, y) for y in range(0, h, 2) for x in range(0, w, 2)]
    dsum = sum(sum(pix[y * w + x]) for x, y in ds)
    return [float(v) for v in (w, h, w * h, rs, gs, bs, mn, mx, len(ds), dsum)]


def test_bmp_roundtrip_both_row_orders():
    """pack → decode recovers all 10 features exactly in both the
    bottom-up (positive height) and top-down (negative height) row
    orders, through non-trivial 4-byte row padding (width % 4 != 0)."""
    from hadoop_project_spark.operators.multimodal import bmp_decoder, pack_bmp24

    w, h = 7, 5
    pix = [((3 * p) % 256, (3 * p + 1) % 256, (3 * p + 2) % 256) for p in range(w * h)]
    for top_down in (False, True):
        payload = pack_bmp24(pix, w, h, top_down=top_down)
        assert bmp_decoder(payload, "bmp") == _bmp_expected(pix, w, h)


def test_bmp_downsample_sees_coordinates():
    """The ds_* features distinguish images with identical byte
    multisets but different pixel PLACEMENT — the decoder's row-order
    normalisation is load-bearing, not just byte accounting."""
    from hadoop_project_spark.operators.multimodal import bmp_decoder, pack_bmp24

    w, h = 4, 2
    bright = (200, 200, 200)
    dark = (10, 10, 10)
    top_bright = [bright] * w + [dark] * w      # row 0 bright
    bottom_bright = [dark] * w + [bright] * w   # row 1 bright
    f_top = bmp_decoder(pack_bmp24(top_bright, w, h), "bmp")
    f_bot = bmp_decoder(pack_bmp24(bottom_bright, w, h), "bmp")
    assert f_top[:8] == f_bot[:8]        # same byte multiset features
    assert f_top[9] != f_bot[9]          # ds_sum differs (y=0 sampled)
    assert f_top[9] == 3 * 200 * 2.0     # even x in {0, 2} on bright row


def test_bmp_decoder_rejects_garbage():
    from hadoop_project_spark.operators.multimodal import bmp_decoder, pack_bmp24

    with pytest.raises(ValueError):
        bmp_decoder(b"not a bmp", "bmp")
    payload = bytearray(pack_bmp24([(1, 2, 3)], 1, 1))
    payload[28] = 32  # claim 32bpp
    with pytest.raises(ValueError, match="24bpp"):
        bmp_decoder(bytes(payload), "bmp")
    with pytest.raises(ValueError, match="truncated"):
        bmp_decoder(pack_bmp24([(1, 2, 3)], 1, 1)[:-2], "bmp")


def test_bmp_property_roundtrip():
    """Hypothesis: arbitrary small images round-trip pack → decode
    exactly in both row orders (padding widths 0..3 all covered by the
    width range)."""
    from hypothesis import given, settings, strategies as st

    from hadoop_project_spark.operators.multimodal import bmp_decoder, pack_bmp24

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        seed=st.integers(0, 2**32 - 1),
        top_down=st.booleans(),
    )
    def check(w, h, seed, top_down):
        pix = [
            tuple((seed + 3 * p + c) % 256 for c in range(3))
            for p in range(w * h)
        ]
        payload = pack_bmp24(pix, w, h, top_down=top_down)
        assert bmp_decoder(payload, "bmp") == _bmp_expected(pix, w, h)

    check()


def test_bmp_pixels_rgb_order_and_roundtrip():
    """bmp_pixels returns (h, w, 3) RGB (not disk BGR) for both row
    orders."""
    import numpy as np

    from hadoop_project_spark.operators.multimodal import (
        bmp_pixels,
        pack_bmp24,
    )

    pix = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    for top_down in (False, True):
        img = bmp_pixels(pack_bmp24(pix, 2, 2, top_down=top_down))
        assert img.shape == (2, 2, 3)
        assert img[0, 0].tolist() == [10, 20, 30]
        assert img[1, 1].tolist() == [100, 110, 120]
        assert img.dtype == np.uint8


def test_dhash60_gradient_and_sensitivity():
    """A horizontal left-bright gradient sets every kept bit; flipping
    it clears them; a single-cell perturbation changes few bits."""
    import numpy as np

    from hadoop_project_spark.operators.multimodal import (
        DHASH_BITS,
        dhash60,
    )

    w, h = 18, 16
    col = np.linspace(255, 0, w).astype(np.uint8)
    img = np.repeat(col[None, :, None], 3, axis=2).repeat(h, axis=0)
    full = dhash60(img)
    assert full == (1 << DHASH_BITS) - 1
    assert dhash60(img[:, ::-1]) == 0
    # bump one sampled cell: hamming distance stays small but nonzero
    img2 = img.copy()
    img2[0:2, 0:2] = 0
    d = bin(full ^ dhash60(img2)).count("1")
    assert 1 <= d <= 4


def test_wav_samples_roundtrip():
    from hadoop_project_spark.operators.multimodal import (
        pack_wav_pcm16,
        wav_samples,
    )

    sr, ch, samples = wav_samples(
        pack_wav_pcm16([0, 100, -100, 32767, -32768], 8000)
    )
    assert (sr, ch) == (8000, 1)
    assert list(samples) == [0, 100, -100, 32767, -32768]


def test_audio_fingerprint60_profile():
    """Monotone-decreasing window energies set every bit; flipping the
    profile clears them."""
    from hadoop_project_spark.operators.multimodal import (
        AFP_WINDOWS,
        DHASH_BITS,
        audio_fingerprint60,
    )

    # 4 samples per window, amplitude decreasing by window
    samples = []
    for w in range(AFP_WINDOWS):
        samples += [1000 - w * 10] * 4
    assert audio_fingerprint60(samples) == (1 << DHASH_BITS) - 1
    assert audio_fingerprint60(samples[::-1]) == 0


def test_banded_hamming_pairs_candidates_and_verify(spark):
    """Pairs sharing a band verify by exact Hamming; codes differing in
    every band produce no candidate."""
    from hadoop_project_spark.operators.multimodal import (
        banded_hamming_pairs,
    )

    rows = [
        (0, 0b0),
        (1, 0b1),                    # shares 3 bands with 0; ham 1
        (2, (1 << 0) | (1 << 15) | (1 << 30) | (1 << 45)),  # differs in
        # every band from 0 -> never a candidate vs 0 even though ham 4
    ]
    codes = spark.createDataFrame(rows, "media_id long, code long")
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in banded_hamming_pairs(codes, "code", ham_t=6).collect()
    }
    assert got[(0, 1)] == 1
    assert (0, 2) not in got
    # 1 and 2 share band 0 (both have bit 0 set, bits 1-14 clear):
    # candidate, verified at hamming 3
    assert got[(1, 2)] == 3


def test_audio_fingerprint60_short_clips_match_sql_oracle():
    """ADVICE r11 #4: clips with fewer samples than AFP_WINDOWS leave
    empty windows that read as ZERO energy and still participate in
    every bit comparison. Certify that contract cross-engine: a DuckDB
    replay with a DENSIFIED window axis (full series, missing energies
    coalesced to 0) must reproduce audio_fingerprint60 bit-exactly for
    sub-window clips — while the naive sparse join (only windows that
    received samples) provably drops bit positions, which is why the
    dense fill is the documented SQL recipe."""
    import duckdb

    from hadoop_project_spark.operators.multimodal import (
        AFP_WINDOWS,
        DHASH_BITS,
        audio_fingerprint60,
    )

    con = duckdb.connect()

    def sql_fp(samples: list[int], dense: bool) -> int:
        con.execute("DROP TABLE IF EXISTS smp")
        con.execute("CREATE TABLE smp (i BIGINT, v BIGINT)")
        if samples:
            con.executemany(
                "INSERT INTO smp VALUES (?, ?)",
                list(enumerate(samples)),
            )
        n = max(len(samples), 1)
        if dense:
            energy = f"""
            SELECT w.w, COALESCE(e.energy, 0) AS energy
            FROM (SELECT unnest(generate_series(0, {AFP_WINDOWS - 1}))
                    AS w) w
            LEFT JOIN (
              SELECT (i * {AFP_WINDOWS}) // {n} AS w,
                     SUM(abs(v)) AS energy
              FROM smp GROUP BY 1
            ) e USING (w)
            """
        else:
            energy = f"""
            SELECT (i * {AFP_WINDOWS}) // {n} AS w,
                   SUM(abs(v)) AS energy
            FROM smp GROUP BY 1
            """
        row = con.execute(f"""
            WITH e AS ({energy})
            SELECT COALESCE(SUM(
                     CASE WHEN a.energy > b.energy
                          THEN CAST(1 AS BIGINT) << CAST(a.w AS INT)
                          ELSE 0 END), 0)
            FROM e a JOIN e b ON b.w = a.w + 1
            WHERE a.w < {DHASH_BITS}
        """).fetchone()
        return int(row[0])

    clips = [
        [],                      # degenerate: code 0
        [1000],                  # one sample -> window 0 only
        [500, -400, 300, 200, 100],          # 5 sparse windows
        [((i * 37) % 91) - 45 for i in range(37)],
        [((i * 53) % 200) - 100 for i in range(60)],
        [((i * 29) % 150) - 75 for i in range(61)],   # exactly full
        [((i * 17) % 300) - 150 for i in range(200)],  # dense control
    ]
    sparse_diverged = False
    for samples in clips:
        want = audio_fingerprint60(samples)
        assert sql_fp(samples, dense=True) == want, len(samples)
        if len(samples) < AFP_WINDOWS and sql_fp(samples, dense=False) != want:
            sparse_diverged = True
    # the naive sparse replay is genuinely wrong for the short regime
    # (otherwise this test certifies nothing)
    assert sparse_diverged
