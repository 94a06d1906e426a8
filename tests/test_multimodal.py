"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, frame-sample fan-out, and the NotImplementedError gate."""

from __future__ import annotations

import hashlib

import pytest

from information_extraction_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media, deterministic_fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    # Digest matches the payload bytes (plumbing is real).
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in rows.items():
        assert r["digest"] == hashlib.md5(src[mid]).hexdigest()
        assert r["n_bytes"] == len(src[mid])
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        if r["kind"] == "image":
            assert r["n_frames"] == 1
        else:
            assert r["n_frames"] >= 1
    # Determinism under re-run and different partitioning.
    again = {
        r["media_id"]: r
        for r in extract_features(media.repartition(7), True).collect()
    }
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_real_decode_path_is_gated(spark):
    media = synthetic_media(spark, n=3)
    feats = extract_features(media, deterministic_fake=False)
    with pytest.raises(Exception) as exc_info:
        feats.collect()
    assert "NotImplementedError" in str(exc_info.value) or "codecs" in str(
        exc_info.value
    )


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, deterministic_fake=True)
    frames = sample_frames(feats, every_k=5)
    got = frames.groupBy("media_id").count().collect()
    by_id = {r["media_id"]: r["count"] for r in got}
    expected = {
        r["media_id"]: len(range(0, max(r["n_frames"] - 1, 0) + 1, 5))
        for r in feats.collect()
    }
    assert by_id == expected
