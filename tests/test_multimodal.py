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


def _make_ppm(w, h, rgb):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _make_bmp(w, h, rgb):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    data_offset = 54
    header = (
        b"BM"
        + (data_offset + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(body), img


def _make_wav(sr=8000, freq=440.0, dur=0.25):
    import numpy as np

    t = np.arange(int(sr * dur)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    data = x.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    ), x


def test_real_decoders_exact():
    """Pure-numpy codecs decode byte-exact pixels/samples."""
    import numpy as np

    from hybrid_sanctions_search_engine_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        resize_bilinear,
    )

    ppm, img = _make_ppm(6, 4, (10, 200, 30))
    assert (decode_ppm(ppm) == img).all()
    bmp, img2 = _make_bmp(5, 3, (255, 0, 128))
    assert (decode_bmp(bmp) == img2).all()
    wav, x = _make_wav()
    samples, sr = decode_wav(wav)
    assert sr == 8000 and samples.size == x.size
    assert np.allclose(samples, x.astype(np.float32) / 32768.0, atol=1e-6)

    small = resize_bilinear(img, 2, 3)
    assert small.shape == (2, 3, 3)
    # constant image stays constant under bilinear resize
    assert np.allclose(small[..., 1], 200.0, atol=1e-3)


def test_real_decoder_in_spark_plan(spark):
    """extract_features(decoder='real') over mixed PPM/BMP/WAV payloads in a
    real mapInPandas plan; compressed payloads raise through the strict stub."""
    import pytest as _pytest

    from hybrid_sanctions_search_engine_spark.operators.multimodal import (
        MEDIA_DECODERS,
        extract_features,
    )

    ppm, _ = _make_ppm(6, 4, (10, 200, 30))
    bmp, _ = _make_bmp(5, 3, (255, 0, 128))
    wav, _ = _make_wav()
    rows = [
        (1, 10, "image", bytearray(ppm), {}),
        (2, 11, "image", bytearray(bmp), {}),
        (3, 12, "audio", bytearray(wav), {}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, doc_id long, media_type string, payload binary, meta map<string,string>",
    )
    feats = {r["media_id"]: r for r in extract_features(media, decoder="real").collect()}
    assert all(len(feats[i]["feature"]) == 32 for i in (1, 2, 3))
    assert feats[1]["n_bytes"] == len(ppm)
    # audio descriptor head: sample-rate kHz then duration
    assert abs(feats[3]["feature"][0] - 8.0) < 1e-6
    assert abs(feats[3]["feature"][1] - 0.25) < 1e-3

    with _pytest.raises(NotImplementedError):
        MEDIA_DECODERS["real"](b"\xff\xd8\xff\xe0jpegdata", "image")
