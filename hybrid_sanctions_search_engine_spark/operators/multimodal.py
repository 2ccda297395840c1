"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` payload columns with typed metadata — the
schema/partitioning/UDF-batch plumbing is real and tested; the actual codec
work (JPEG decode, resampling) is stubbed behind ``MEDIA_DECODERS`` because
image/audio libraries are not in this container.  Each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(derived from the payload bytes) so downstream shapes are exercised
end-to-end.

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


MEDIA_DECODERS = {"fake": _fake_decode, "strict": _strict_decode}


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
