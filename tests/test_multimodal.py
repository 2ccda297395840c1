"""Multimodal binary-column plumbing: schemas, Arrow batches, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, 10, "image", bytes(range(256)) * 4, {"w": "16", "h": "16"}),
        (2, 11, "audio", b"\x00\x01" * 500, {"sr": "16000"}),
        (3, 12, "video", bytes(range(100)) * 10, {"fps": "30"}),
        (4, 13, "image", None, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(media):
    feats = extract_features(media).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id[1]["feature"]) == 32
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-5
    assert by_id[1]["n_bytes"] == 1024
    assert by_id[4]["n_bytes"] == 0 and sum(by_id[4]["feature"]) == 0.0
    # determinism
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again[1] == by_id[1]["feature"]


def test_strict_decoder_raises(media, spark):
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        extract_features(media, decoder="strict").collect()


def test_sample_frames(media):
    frames = sample_frames(media, n_frames=4).collect()
    assert len(frames) == 4  # only the single video row, 4 frames
    assert [f["frame_idx"] for f in frames] == [0, 1, 2, 3]
    assert all(len(f["frame_payload"]) == 250 for f in frames)


def test_media_stats(media):
    stats = {r["media_type"]: r for r in media_stats(media).collect()}
    assert stats["image"]["n"] == 2
    assert stats["video"]["total_bytes"] == 1000
