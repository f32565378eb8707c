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
