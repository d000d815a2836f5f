"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
metadata struct, and runs decode / feature-extract / resize / frame-sample
as Arrow-batched kernels over `mapInPandas`. The Spark-side plumbing here —
schemas, partition sizing, UDF signatures, iterator-of-batches shape — is
real and tested; the codec step itself is pluggable, because no image/audio
library ships in this container:

- default: a deterministic fake decoder (content-hash seeded) so pipelines
  and tests run end-to-end reproducibly;
- `decoder="strict"`: raises NotImplementedError at the decode site — the
  marked seam where Pillow/torchaudio/pyav plug in on a real cluster.

Scale notes: media rows are large and skew-prone — `media_repartition`
targets a bytes-per-partition budget using the metadata size column instead
of row counts, so one 4 GB video and four thousand 1 MB images get similar
partition weight.
"""

from __future__ import annotations

import hashlib
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
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "media_repartition",
    "decode_features",
    "resize_images",
    "sample_frames",
]

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("fmt", StringType(), False),  # png, wav, mp4, ...
        StructField("payload", BinaryType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sha256", StringType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: content-hash-seeded vector. Replaces
    the real `PIL.Image.open(...)` / `torchaudio.load(...)` call on-cluster."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _decode_or_raise(decoder: str):
    if decoder == "strict":
        raise NotImplementedError(
            "real media decoding needs Pillow/torchaudio/pyav — not installed "
            "in this environment; plug the library call in at this seam"
        )


def media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payloads are seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[kind]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 4096)))
        rows.append(
            (
                i,
                kind,
                fmt,
                payload,
                len(payload),
                rng.randint(16, 1920) if kind != "audio" else None,
                rng.randint(16, 1080) if kind != "audio" else None,
                rng.randint(1000, 600_000) if kind != "image" else None,
                hashlib.sha256(payload).hexdigest(),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_repartition(df: DataFrame, target_bytes: int = 256 << 20) -> DataFrame:
    """Partition by payload bytes, not row count: rows are wildly uneven."""
    total = df.agg(F.coalesce(F.sum("size_bytes"), F.lit(0))).collect()[0][0]
    parts = max(1, int(total / target_bytes))
    return df.repartition(parts)


def decode_features(
    df: DataFrame, dim: int = 64, decoder: str = "fake", batch_rows: int = 32
) -> DataFrame:
    """media -> (media_id, kind, embedding): decode + feature-extract.

    Arrow batches are re-chunked to `batch_rows` inside the iterator so a
    batch of large payloads cannot blow worker memory (the iterator shape of
    mapInPandas exists exactly for this)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode_or_raise(decoder)
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                part = pdf.iloc[lo : lo + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"].to_numpy(),
                        "kind": part["kind"].to_numpy(),
                        "embedding": [
                            _fake_decode(p, dim).tolist() for p in part["payload"]
                        ],
                    }
                )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, max_side: int = 256, decoder: str = "fake"
) -> DataFrame:
    """image rows -> resized payloads (fake: truncated payload, scaled dims;
    real: PIL resize at the marked seam). Non-image rows are filtered out
    JVM-side before any Python runs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode_or_raise(decoder)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            scale = np.minimum(1.0, max_side / np.maximum(w, h))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": [
                        bytes(p[: max(1, int(len(p) * s * s))])
                        for p, s in zip(pdf["payload"], scale)
                    ],
                    "width": (w * scale).astype(np.int32),
                    "height": (h * scale).astype(np.int32),
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, RESIZE_SCHEMA)
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, decoder: str = "fake"
) -> DataFrame:
    """video rows -> 1:N sampled frames (fake: payload slices; real: pyav
    keyframe decode at the seam). Output fans out rows, so the downstream
    partition count grows — callers repartition after if needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode_or_raise(decoder)
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                n = int(min(max_frames, max(1, (r.duration_ms or 0) // every_ms)))
                step = max(1, len(r.payload) // max(n, 1))
                for fi in range(n):
                    out.append(
                        (
                            r.media_id,
                            fi,
                            fi * every_ms,
                            bytes(r.payload[fi * step : (fi + 1) * step]),
                        )
                    )
            if out:
                yield pd.DataFrame(
                    out, columns=["media_id", "frame_idx", "frame_ms", "payload"]
                )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", "payload")
        .mapInPandas(run, FRAME_SCHEMA)
    )
