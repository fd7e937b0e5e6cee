"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs over ``mapInPandas``.

The image decode is REAL for the PPM (P6) container — a codec-free format
whose header+pixel layout parses in pure Python/numpy — and audio decode is
real for raw unsigned 8-bit PCM. Compressed formats (JPEG/PNG magic bytes)
raise ``NotImplementedError``: those codecs are not in this container, and
the honest stub marks exactly where PIL/ffmpeg plug in. Everything
Spark-side — schema, partition sizing, UDF signatures, batch shapes — plus
the PPM/PCM decode itself is therefore value-checkable end-to-end (the
registry queries carry closed-form DuckDB oracles).

Scale notes: binary payloads dominate row size → cap
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits executor
memory; feature extraction emits fixed-size scalars/arrays
(columnar-friendly); never collect blobs to the driver.
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
    "media_id bigint, kind string, width int, height int, "
    "n_samples bigint, mean_val double, decode_ok boolean"
)


def _ppm_bytes(media_id: int, w: int, h: int) -> bytes:
    """Deterministic PPM(P6) blob: pixel byte k = (id*7 + k*13) % 256."""
    header = f"P6\n{w} {h}\n255\n".encode()
    k = np.arange(w * h * 3, dtype=np.int64)
    return header + ((media_id * 7 + k * 13) % 256).astype(np.uint8).tobytes()


def _pcm_bytes(media_id: int, n: int) -> bytes:
    """Deterministic raw u8 PCM blob: sample byte k = (id*11 + k*5) % 256."""
    k = np.arange(n, dtype=np.int64)
    return ((media_id * 11 + k * 5) % 256).astype(np.uint8).tobytes()


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: REAL PPM image blobs, real raw
    u8 PCM audio blobs, stub video payloads — closed-form byte recipes so a
    SQL oracle can recompute every decoded feature without the blobs."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 8 + (i % 5) * 4, 6 + (i % 7) * 2
            rows.append((i, kind, bytearray(_ppm_bytes(i, w, h)),
                         w, h, None, None))
        elif kind == "audio":
            n_samples = 256 + (i % 5) * 64
            rows.append((i, kind, bytearray(_pcm_bytes(i, n_samples)),
                         None, None, 16000, None))
        else:
            rows.append((i, kind, bytearray(bytes((i + k) % 256 for k in range(64))),
                         None, None, None, 30))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image(blob: bytes) -> tuple[int, int, float]:
    """Decode one image payload → (width, height, mean_pixel).

    Real parse for PPM(P6); compressed containers need codec libraries not
    present here — the NotImplementedError marks the PIL/opencv seam.
    The mean is an integer sum divided once at the end, so it is bit-equal
    to the oracle's integer-list construction.
    """
    if blob[:2] != b"P6":
        raise NotImplementedError(
            "only PPM(P6) decodes codec-free; JPEG/PNG need PIL/opencv "
            "(not available in this container)")
    # header: P6 \n <w> <h> \n <maxval> \n  (single-space variant we emit)
    parts = bytes(blob).split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(parts[3], dtype=np.uint8)
    if px.size != w * h * 3:
        raise ValueError(f"PPM payload {px.size} != {w}*{h}*3")
    return w, h, float(int(px.sum(dtype=np.int64))) / px.size


def decode_audio(blob: bytes) -> tuple[int, float]:
    """Decode one raw u8 PCM payload → (n_samples, mean_sample)."""
    s = np.frombuffer(bytes(blob), dtype=np.uint8)
    return s.size, float(int(s.sum(dtype=np.int64))) / s.size


def extract_features(media: DataFrame) -> DataFrame:
    """``mapInPandas`` feature extraction over binary media columns.

    Batches arrive as Arrow-backed pandas frames; each yields one
    fixed-shape feature row per input row (video decode stays stubbed —
    ``decode_ok=false`` — until a real frame decoder exists). The iterator
    shape keeps peak memory to one batch of blobs per task regardless of
    partition size.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"],
                   "width": [], "height": [], "n_samples": [],
                   "mean_val": [], "decode_ok": []}
            for kind, blob in zip(pdf["kind"], pdf["content"]):
                w = h = ns = mv = None
                ok = True
                if kind == "image":
                    w, h, mv = decode_image(blob)
                elif kind == "audio":
                    ns, mv = decode_audio(blob)
                else:
                    ok = False
                out["width"].append(w)
                out["height"].append(h)
                out["n_samples"].append(ns)
                out["mean_val"].append(mv)
                out["decode_ok"].append(ok)
            res = pd.DataFrame(out)
            res["width"] = res["width"].astype("Int32")
            res["height"] = res["height"].astype("Int32")
            res["n_samples"] = res["n_samples"].astype("Int64")
            yield res

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
