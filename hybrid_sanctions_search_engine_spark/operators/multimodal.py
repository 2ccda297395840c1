"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` payload columns with typed metadata.  The
``real`` decoder handles every format pure numpy can parse — binary PPM/PGM
images, uncompressed 24-bit BMP, RIFF/WAVE PCM audio — with bilinear resize
and 32-dim image/audio descriptors (color histogram; log-spectrum bands via
rFFT).  Compressed codecs (JPEG/PNG/MP3/H.264) stay behind a
``NotImplementedError`` stub: those genuinely need external libraries this
container doesn't ship.  A deterministic ``fake`` decoder exercises the
downstream shapes when payloads are opaque.

All transforms run through ``mapInPandas`` — Arrow record batches in/out, no
row-at-a-time Python — and are partition-preserving (no shuffle): at 100 TB
the media table is read/written partition-parallel, with payload bytes never
crossing the network except to their own executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: byte histogram (32 bins),
    L1-normalized. Replace with PIL/librosa/pyav decode in production."""
    if not payload:
        return np.zeros(32, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 3, minlength=32).astype(np.float32)
    total = hist.sum() or 1.0
    return hist / total


def _strict_decode(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        f"real {media_type} decoding requires codec libraries not present in "
        "this environment; install PIL/librosa/pyav and register a decoder "
        "in MEDIA_DECODERS"
    )


# ---------------------------------------------------------------------------
# REAL pure-numpy codecs — formats that need no external library:
#   images: binary PPM (P6) / PGM (P5), uncompressed 24-bit BMP
#   audio:  RIFF/WAVE PCM (8/16-bit)
# Compressed formats (JPEG/PNG/MP3/H.264) stay behind the strict stub —
# genuinely environment-forced (no codec libs, no network).
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 array [H, W, 3] or [H, W]."""
    if not payload.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    channels = 3 if payload.startswith(b"P6") else 1
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * w * channels, offset=pos)
    return raw.reshape(h, w, 3) if channels == 3 else raw.reshape(h, w)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → uint8 [H, W, 3] RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_bytes, offset=data_offset
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    img = rows[::-1] if bottom_up else rows
    return img[..., ::-1]  # BGR → RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (mono float32 samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError("only PCM WAV is supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if n_channels > 1:
        x = x[: (x.size // n_channels) * n_channels]
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, sample_rate


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of [H, W] or [H, W, C] uint8/float → float32."""
    in_h, in_w = img.shape[:2]
    a = img.astype(np.float32)
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :]
    if a.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def _image_feature(img: np.ndarray) -> np.ndarray:
    """32-dim image descriptor: [h, w, mean/std per channel] + 3×3×3 RGB
    histogram (L1-normalized)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3).astype(np.int64)
    bins = np.minimum(flat * 3 // 256, 2)
    code = bins[:, 0] * 9 + bins[:, 1] * 3 + bins[:, 2]
    hist = np.bincount(code, minlength=27).astype(np.float32)
    hist /= hist.sum() or 1.0
    head = np.array(
        [h, w, *img.mean(axis=(0, 1)) / 255.0], dtype=np.float32
    )
    return np.concatenate([head[:5], hist]).astype(np.float32)


def _audio_feature(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """32-dim audio descriptor: [sr/1e3, duration, rms, zero-crossings] +
    28 log-spectrum band energies (numpy rFFT)."""
    n = samples.size
    dur = n / max(sample_rate, 1)
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples[: min(n, 1 << 16)])) if n else np.zeros(1)
    bands = np.array_split(spec, 28)
    band_e = np.array(
        [np.log1p(float(b.sum())) for b in bands], dtype=np.float32
    )
    head = np.array([sample_rate / 1000.0, dur, rms, zc], dtype=np.float32)
    return np.concatenate([head, band_e]).astype(np.float32)


def _real_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch on magic bytes; raises NotImplementedError for compressed
    codecs (JPEG/PNG/MP3/…) — those genuinely need external libraries."""
    if not payload:
        return np.zeros(32, dtype=np.float32)
    if payload.startswith((b"P6", b"P5")):
        return _image_feature(decode_ppm(payload))
    if payload.startswith(b"BM"):
        return _image_feature(decode_bmp(payload))
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return _audio_feature(*decode_wav(payload))
    return _strict_decode(payload, media_type)


MEDIA_DECODERS = {"fake": _fake_decode, "strict": _strict_decode, "real": _real_decode}


def extract_features(
    media: DataFrame, decoder: str = "fake", feature_dim: int = 32
) -> DataFrame:
    """media table → (media_id, doc_id, media_type, feature, n_bytes).

    ``mapInPandas``: one Arrow batch in, one out; partition-preserving."""
    decode = MEDIA_DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p if p is not None else b"", mt).tolist()
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """video rows → (media_id, frame_idx, frame_payload): deterministic
    equal-stride byte-range slices standing in for real frame extraction
    (the Spark-side 1:N explode shape is the part that matters at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payload = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                stride = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_payload.append(data[i * stride : (i + 1) * stride])
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_payload": out_payload,
                }
            )

    return media.where(F.col("media_type") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Payload size stats per media type — pure JVM aggregation."""
    return (
        media.withColumn("n_bytes", F.length("payload"))
        .groupBy("media_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.avg("n_bytes").alias("avg_bytes"),
        )
    )
