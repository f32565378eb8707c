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
