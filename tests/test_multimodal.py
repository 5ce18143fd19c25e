"""Multimodal binary-column plumbing: Arrow-batched mapInPandas feature
extraction with the deterministic fake decoder, frame sampling, and the
NotImplementedError gate on the real decode path."""

import hashlib

import pytest

from translator_ingests_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample,
)


def _media_rows():
    return [
        (1, "image", b"\x89PNG-fake-bytes-1", {"width": 4, "height": 4,
                                               "sample_rate": None, "n_frames": None}),
        (2, "image", b"\x89PNG-fake-bytes-2", {"width": 8, "height": 8,
                                               "sample_rate": None, "n_frames": None}),
        (3, "video", b"\x00fakemp4", {"width": 16, "height": 16,
                                      "sample_rate": None, "n_frames": 7}),
        (4, "audio", None, {"width": None, "height": None,
                            "sample_rate": 16000, "n_frames": None}),
    ]


def test_extract_features_arrow_batched(spark):
    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA).repartition(2)
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(out) == 4
    assert out[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert out[1]["payload_sha256"] == hashlib.sha256(b"\x89PNG-fake-bytes-1").hexdigest()
    assert len(out[1]["feature"]) == 8
    # deterministic: same payload → same feature on every run
    assert out[1]["feature"] == [
        pytest.approx(b / 255.0)
        for b in hashlib.sha256(b"\x89PNG-fake-bytes-1").digest()[:8]
    ]
    # null payload propagates nulls, row not dropped
    assert out[4]["n_bytes"] is None and out[4]["feature"] is None


def test_frame_sample_plumbing(spark):
    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    frames = frame_sample(media, every_n=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in frames] == [
        (3, 0), (3, 2), (3, 4), (3, 6)
    ]


def test_real_decode_path_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", fake=False)
