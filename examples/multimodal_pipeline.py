"""Multimodal ingest → decode → feature pipeline, plus embedding-corpus
clustering — the media/vector tier this repo adds beyond the reference
(BASELINE.json §2.3).

Real bytes end-to-end: images are encoded as genuine 24-bit BMPs and
audio as genuine PCM16 WAVs by the library's own encoders, wrapped with
typed metadata, then decoded by the REAL pure-numpy/stdlib decoders (no
fake_decoder) through the Arrow-batched `mapInPandas` path — the same
plumbing a PIL/ffmpeg decoder would drop into.  The embedding corpus is
then clustered with the distributed KMeans operator (the registry query
the driver hash-checks against its 5-stage unrolled SQL oracle).
"""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def run(spark) -> bool:
    from wukong_spark.operators.multimodal import (
        attach_media_metadata,
        decode_audio,
        decode_images,
        encode_bmp,
        encode_wav_pcm16,
    )
    from wukong_spark.queries import load_all

    # 1. image leg: seeded BMPs → metadata → real decode + resize to 8×8
    imgs = [
        (
            i,
            bytearray(
                encode_bmp(
                    np.random.default_rng(i).integers(
                        0, 256, size=(24, 18, 3), dtype=np.uint8
                    )
                )
            ),
        )
        for i in range(16)
    ]
    media = attach_media_metadata(
        spark.createDataFrame(imgs, "doc_id long, blob binary"),
        "blob",
        kind="image",
        mime="image/bmp",
        id_col="doc_id",
    )
    decoded = decode_images(media, height=8, width=8).collect()
    if len(decoded) != 16 or any(len(r.pixels) != 8 * 8 * 3 for r in decoded):
        return False

    # 2. audio leg: seeded WAVs → real decode → per-clip features
    clips = []
    sr = 16000
    for i in range(6):
        t = np.arange(sr // 8) / sr
        x = 0.2 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        clips.append((i, bytearray(encode_wav_pcm16(x, sr))))
    audio = attach_media_metadata(
        spark.createDataFrame(clips, "doc_id long, blob binary"),
        "blob",
        kind="audio",
        mime="audio/wav",
        id_col="doc_id",
    )
    feats = decode_audio(audio).collect()
    if len(feats) != 6 or any(r.sample_rate != sr or r.n_samples != sr // 8 for r in feats):
        return False

    # 3. vector leg: cluster the embedding corpus (k=8, 5 Lloyd iterations)
    #    and require every cluster non-empty with a safe assignment margin
    km = load_all()["embed_kmeans_clusters"].fn(spark, SF_DIR).collect()
    if len(km) != 8:
        return False
    return all(r.n > 0 and r.margin_ok for r in km)


if __name__ == "__main__":
    from _common import report, session

    report("multimodal_pipeline", run(session()))
