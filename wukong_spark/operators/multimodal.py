"""Multimodal column operators (SURVEY.md §2.3 — BASELINE.json gap-fill).

Media (image/audio/video) are opaque `binary` columns plus a typed metadata
struct — the 100 TB-scale pattern: bytes flow through Arrow batches, never
through Python row-at-a-time; decode/feature-extract runs per batch in
`mapInPandas`.

The actual codec step is STUBBED (image/audio libs are not in this
container): `decode_stub` raises NotImplementedError unless
`fake_decoder=True`, in which case a deterministic fake (seeded by content
hash) produces real-shaped arrays so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is fully exercised and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried alongside every media payload
MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, n_bytes long, checksum string"
)


def attach_media_metadata(df: DataFrame, payload_col: str, kind: str, mime: str, id_col: str) -> DataFrame:
    """Wrap a raw binary column with typed metadata (size + md5 checksum) —
    all JVM built-ins, no Python in the path."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.length(payload_col).cast("long").alias("n_bytes"),
        F.md5(payload_col).alias("checksum"),
        F.col(payload_col).alias("payload"),
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: content-hash-seeded uint8 image."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    height: int = 32,
    width: int = 32,
    fake_decoder: bool = False,
) -> DataFrame:
    """binary → fixed-size RGB tensor + channel statistics, Arrow-batched.

    Real codec integration point: replace `_fake_pixels` with
    PIL/libvips/ffmpeg. The Spark plumbing (batch shape, schema,
    partition-parallelism) is identical either way.
    """
    if not fake_decoder:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake_decoder=True to exercise the pipeline with a "
            "deterministic content-seeded decoder"
        )

    out_schema = (
        "media_id long, height int, width int, pixels array<int>, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                px = _fake_pixels(bytes(payload), height, width)
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        int(mid),
                        height,
                        width,
                        px.flatten().astype(np.int32).tolist(),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "height", "width", "pixels",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.select("media_id", payload_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    fake_decoder: bool = False,
) -> DataFrame:
    """Video → n sampled frames (stubbed): one output row per frame,
    exploded — the shape a real ffmpeg-based sampler produces."""
    if not fake_decoder:
        raise NotImplementedError(
            "video codecs are not available; pass fake_decoder=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for k in range(n_frames):
                    px = _fake_pixels(bytes(payload) + bytes([k]), 8, 8)
                    rows.append((int(mid), k, float(px.mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])

    return df.select("media_id", payload_col).mapInPandas(
        run, "media_id long, frame_idx int, frame_mean double"
    )
