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

    # 3. WebDataset shard leg (r7): tar of (png, json) sample pairs →
    #    explode members → group by sample key → decode the image field
    import io
    import tarfile

    from wukong_spark.operators.archive import explode_tar, group_webdataset_samples
    from wukong_spark.operators.multimodal import encode_png

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(4):
            png = encode_png(
                np.random.default_rng(50 + i).integers(0, 256, (8, 8, 3), dtype=np.uint8)
            )
            meta = b'{"caption": "sample %d"}' % i
            for name, data in ((f"{i:03d}.png", png), (f"{i:03d}.json", meta)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    shard = spark.createDataFrame(
        [(0, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    grouped = group_webdataset_samples(explode_tar(shard)).collect()
    if len(grouped) != 4 or any(set(r.fields) != {"png", "json"} for r in grouped):
        return False

    # 4. video leg (r7): MJPEG AVI → evenly-spaced real frame sampling
    from wukong_spark.operators.multimodal import frame_sample
    from wukong_spark.operators.video import encode_mjpeg_avi

    frames = [
        np.full((8, 8, 3), (40 * i, 100, 255 - 40 * i), np.uint8) for i in range(5)
    ]
    vid = spark.createDataFrame(
        [(0, bytearray(encode_mjpeg_avi(frames, quality=95)))],
        "media_id long, payload binary",
    )
    sampled = frame_sample(vid, n_frames=3).collect()
    if sorted(r.frame_no for r in sampled) != [0, 2, 4]:
        return False

    # 5. vector leg: cluster the embedding corpus (k=8, 5 Lloyd iterations)
    #    and require every cluster non-empty with a safe assignment margin
    km = load_all()["embed_kmeans_clusters"].fn(spark, SF_DIR).collect()
    if len(km) != 8:
        return False
    return all(r.n > 0 and r.margin_ok for r in km)


if __name__ == "__main__":
    from _common import report, session

    report("multimodal_pipeline", run(session()))
