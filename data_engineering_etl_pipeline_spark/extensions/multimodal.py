"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs over ``mapInPandas``.

The decode step is STUBBED (image/audio codec libraries are not in this
container): ``decode_image_batch`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected. Everything Spark-side — schema,
partition sizing, UDF signatures, batch shapes — is real and tested, so
swapping in a real decoder (PIL/torchaudio/ffmpeg) is a one-function change.

Scale notes: binary payloads dominate row size → cap
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits executor
memory; feature extraction emits fixed-size arrays (columnar-friendly);
never collect blobs to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat array<double>, "
    "feat_dim int, decode_ok boolean"
)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata) for
    exercising the plumbing end-to-end without codec libraries."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload),
                     224 if kind == "image" else None,
                     224 if kind == "image" else None,
                     16000 if kind == "audio" else None,
                     30 if kind == "video" else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image_batch(contents: pd.Series, fake: bool = False) -> pd.Series:
    """Decode a batch of image payloads → flat pixel arrays.

    Real decoding requires an image library not present in this container;
    ``fake=True`` selects a deterministic stand-in (byte histogram) so the
    distributed plumbing stays testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this "
            "container — pass fake=True for the deterministic stand-in")
    def hist(b: bytes) -> list[float]:
        arr = np.frombuffer(b, dtype=np.uint8)
        h, _ = np.histogram(arr, bins=16, range=(0, 256))
        total = float(len(arr)) or 1.0
        return (h / total).tolist()
    return contents.map(hist)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """``mapInPandas`` feature extraction over binary media columns.

    Batches arrive as Arrow-backed pandas frames; each yields fixed-dim
    feature vectors. The iterator shape keeps peak memory to one batch of
    blobs per task regardless of partition size.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["content"], fake=fake_decode)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": feats.map(len).astype("int32"),
                "decode_ok": True,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-index plan per video
    row (decode itself stubbed). Shows the row-explosion pattern with
    bounded fan-out — the shape a real ffmpeg-backed sampler plugs into."""
    videos = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return videos.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
    )
