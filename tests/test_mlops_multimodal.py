"""ML inference + multimodal plumbing tests.

Inference mirrors the reference oracle: distributed predict must equal the
local model's predict exactly (`/root/reference/README.md:294-304` —
ParallelPostFit differential pattern)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wukong_spark.mlops import LinearModel, make_classification_blocks, predict_broadcast
from wukong_spark.operators.multimodal import (
    attach_media_metadata,
    decode_audio,
    decode_bmp,
    decode_images,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    frame_sample,
    resize_nearest,
)


def test_make_classification_deterministic(spark):
    a = make_classification_blocks(spark, 1000, 8, 10, seed=3).toPandas()
    b = make_classification_blocks(spark, 1000, 8, 10, seed=3).toPandas()
    a = a.sort_values("sample_id", ignore_index=True)
    b = b.sort_values("sample_id", ignore_index=True)
    assert len(a) == 1000
    assert (a["sample_id"] == b["sample_id"]).all()
    assert all(np.array_equal(x, y) for x, y in zip(a["features"], b["features"]))


def test_predict_broadcast_matches_local(spark):
    # fit locally, predict distributed, compare to local predict — exact
    df = make_classification_blocks(spark, 2000, 8, 20, seed=3)
    local = df.toPandas().sort_values("sample_id", ignore_index=True)
    x = np.vstack(local["features"].map(np.asarray).to_numpy())
    y = local["label"].to_numpy()
    model = LinearModel.fit(x, y)

    pred_df = predict_broadcast(df, model, id_cols=("sample_id",)).toPandas()
    pred_df = pred_df.sort_values("sample_id", ignore_index=True)
    assert np.array_equal(pred_df["prediction"].to_numpy(), model.predict(x))
    # the fitted stand-in should beat chance comfortably on its own data
    assert (model.predict(x) == y).mean() > 0.9


def _media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    return attach_media_metadata(payload, "blob", kind="image", mime="image/fake", id_col="doc_id")


def test_attach_media_metadata(spark):
    m = _media_df(spark).toPandas()
    assert len(m) == 20
    assert set(m["kind"]) == {"image"}
    assert (m["n_bytes"] > 0).all()
    assert m["checksum"].str.len().eq(32).all()


def test_decode_stub_raises_without_fake(spark):
    # non-BMP/PPM payloads without fake_decoder fail at execution time
    # (the decode dispatch runs inside the Spark task)
    with pytest.raises(Exception, match="fake_decoder"):
        decode_images(_media_df(spark)).collect()


def test_decode_real_bmp_roundtrip_local():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(13, 10, 3), dtype=np.uint8)  # odd stride pad
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_decode_real_ppm_local():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n9 7\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(payload), px)


def test_decode_real_wav_roundtrip_local():
    sr = 8000
    t = np.arange(sr // 4) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    srate, nch, got = decode_wav(encode_wav_pcm16(x, sr))
    assert (srate, nch) == (sr, 1)
    assert np.abs(got - x).max() < 1.0 / 32767  # 16-bit quantization bound


def test_resize_nearest_identity_and_downscale():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert resize_nearest(px, 4, 6) is px
    small = resize_nearest(px, 2, 3)
    assert small.shape == (2, 3, 3)
    assert np.array_equal(small[0, 0], px[0, 0])


def _bmp_media_df(spark, n=12, h=16, w=16):
    rows = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, bytearray(encode_bmp(px)), px))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows], "doc_id long, blob binary"
    )
    media = attach_media_metadata(
        df, "blob", kind="image", mime="image/bmp", id_col="doc_id"
    )
    return media, {i: px for i, _, px in rows}


def test_decode_images_real_bmp_end_to_end(spark):
    """Real BMP bytes through the distributed decode path — NO fake
    decoder (VERDICT r4 #5): decoded pixels must equal the encoded source
    exactly, including the nearest-neighbor resize identity case."""
    media, want = _bmp_media_df(spark, n=12, h=16, w=16)
    out = decode_images(media, height=16, width=16).toPandas()
    assert len(out) == 12
    for _, row in out.iterrows():
        px = np.array(row["pixels"], dtype=np.uint8).reshape(16, 16, 3)
        assert np.array_equal(px, want[row["media_id"]])
        assert abs(px[..., 1].mean() - row["mean_g"]) < 1e-9


def test_decode_images_real_bmp_resized(spark):
    media, want = _bmp_media_df(spark, n=4, h=32, w=24)
    out = decode_images(media, height=8, width=8).toPandas()
    for _, row in out.iterrows():
        px = np.array(row["pixels"], dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(px, resize_nearest(want[row["media_id"]], 8, 8))


def test_decode_audio_real_wav_end_to_end(spark):
    """Real PCM WAV bytes through the distributed audio decode — no fake."""
    sr = 16000
    clips = []
    for i in range(6):
        t = np.arange(sr // 8) / sr
        x = (0.1 + 0.1 * i) * np.sin(2 * np.pi * (220 + 110 * i) * t)
        clips.append((i, bytearray(encode_wav_pcm16(x, sr)), x))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in clips], "doc_id long, blob binary"
    )
    media = attach_media_metadata(
        df, "blob", kind="audio", mime="audio/wav", id_col="doc_id"
    )
    out = decode_audio(media).toPandas().sort_values("media_id", ignore_index=True)
    assert len(out) == 6
    assert (out["sample_rate"] == sr).all()
    assert (out["n_samples"] == sr // 8).all()
    for (i, _, x), (_, row) in zip(clips, out.iterrows()):
        assert abs(row["rms"] - float(np.sqrt(np.mean(x**2)))) < 1e-3
        assert abs(row["peak"] - float(np.abs(x).max())) < 1e-3


def test_decode_images_fake_deterministic(spark):
    out1 = decode_images(_media_df(spark), fake_decoder=True, height=8, width=8).toPandas()
    out2 = decode_images(_media_df(spark), fake_decoder=True, height=8, width=8).toPandas()
    out1 = out1.sort_values("media_id", ignore_index=True)
    out2 = out2.sort_values("media_id", ignore_index=True)
    assert len(out1) == 20
    assert (out1["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in out1["pixels"])
    assert all(np.array_equal(p, q) for p, q in zip(out1["pixels"], out2["pixels"]))
    # channel means consistent with pixels
    row = out1.iloc[0]
    px = np.array(row["pixels"]).reshape(8, 8, 3)
    assert abs(px[..., 0].mean() - row["mean_r"]) < 1e-9


def test_frame_sample(spark):
    out = frame_sample(_media_df(spark), n_frames=3, fake_decoder=True).toPandas()
    assert len(out) == 60
    assert set(out["frame_idx"]) == {0, 1, 2}


def test_fake_decoder_survives_bmp_lookalike_payloads(spark):
    """A payload that merely starts with 'BM'/'P6'/'RIFF' but isn't valid
    media must fall through to the fake decoder (testdata text can start
    with anything), while invalid lookalikes WITHOUT fake_decoder raise."""
    rows = [(0, bytearray(b"BM plain text, not a bitmap")),
            (1, bytearray(b"P6 also just text")),
            (2, bytearray(b"neither"))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = attach_media_metadata(df, "blob", kind="image", mime="x", id_col="doc_id")
    out = decode_images(media, fake_decoder=True, height=4, width=4).toPandas()
    assert len(out) == 3 and all(len(p) == 4 * 4 * 3 for p in out["pixels"])
    with pytest.raises(Exception):
        decode_images(media, height=4, width=4).collect()


def test_decode_ppm_scales_small_maxval():
    # spec: samples are fractions of maxval — full intensity at maxval=100
    # must decode as 255, half intensity as ~128
    px = np.array([[[100, 50, 0]]], dtype=np.uint8)
    payload = b"P6\n1 1\n100\n" + px.tobytes()
    got = decode_ppm(payload)
    assert got.tolist() == [[[255, 128, 0]]]


# -- PNG codec (r7: stdlib zlib + numpy unfiltering) ------------------------


def test_png_roundtrip_all_channels_mixed_filters():
    from wukong_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(11, 9, ch), dtype=np.uint8)
        for mode in ("mixed", "none"):
            assert np.array_equal(decode_png(encode_png(px, filter_mode=mode)), px)


def test_png_roundtrip_structured_image_stresses_filters():
    from wukong_spark.operators.multimodal import decode_png, encode_png

    # gradients make Sub/Up/Average/Paeth residuals nontrivial (wraparound
    # mod 256 exercised), unlike white-noise inputs
    g = np.add.outer(np.arange(40), np.arange(33)).astype(np.uint8)
    g2 = np.multiply.outer(np.arange(40), np.arange(33)).astype(np.uint8)
    px = np.stack([g, g2, 255 - g], axis=2)
    assert np.array_equal(decode_png(encode_png(px, filter_mode="mixed")), px)


def test_png_to_rgb_conversions():
    from wukong_spark.operators.multimodal import png_to_rgb

    rng = np.random.default_rng(8)
    grey = rng.integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
    assert np.array_equal(png_to_rgb(grey), np.repeat(grey, 3, axis=2))
    ga = rng.integers(0, 256, size=(4, 4, 2), dtype=np.uint8)
    assert np.array_equal(png_to_rgb(ga), np.repeat(ga[:, :, :1], 3, axis=2))
    rgba = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    assert np.array_equal(png_to_rgb(rgba), rgba[:, :, :3])


def test_png_rejects_unsupported_variants():
    from wukong_spark.operators.multimodal import PNG_MAGIC, decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # corrupt: magic only, no chunks
    with pytest.raises(ValueError):
        decode_png(PNG_MAGIC)
    # truncated pixel data: chop the IDAT payload
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    import struct as _s
    import zlib as _z

    # rebuild with an IDAT holding too few rows
    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    short_idat = _z.compress(b"\x00" + b"\x00" * 12)  # one row of four

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    bad = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", short_idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    assert isinstance(good, bytes)


def test_decode_images_real_png_end_to_end(spark):
    from wukong_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payload = encode_png(px, filter_mode="mixed")
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = decode_images(df, height=8, width=8).collect()[0]
    got = np.array(row.pixels, np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, px)
    assert row.mean_r == pytest.approx(px[:, :, 0].mean())


# -- palette-indexed PNG / BMP / ICO (r9: PLTE + color tables) ---------------


def test_png_palette_roundtrip_all_depths():
    """Color type 3 at depths 1/2/4/8, mixed per-row filters, odd widths
    (sub-byte row padding): decode must return exactly palette[indices];
    a tRNS chunk adds an alpha lane (255 where unlisted)."""
    from wukong_spark.operators.multimodal import decode_png, encode_png_palette

    rng = np.random.default_rng(11)
    for depth in (1, 2, 4, 8):
        for h, w in ((7, 5), (16, 16), (13, 17), (1, 1)):
            n = min(1 << depth, 29)
            pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            out = decode_png(encode_png_palette(idx, pal, depth=depth))
            assert np.array_equal(out, pal[idx]), (depth, h, w)
            trns = bytes(rng.integers(0, 256, min(n, 5), dtype=np.uint8))
            out4 = decode_png(encode_png_palette(idx, pal, trns=trns, depth=depth))
            alpha = np.full(n, 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            assert np.array_equal(out4, np.dstack([pal[idx], alpha[idx]]))


def test_png_adam7_interlace_roundtrip():
    """Adam7 (r9): every channel count and palette depth roundtrips
    through the 7-pass scatter, including dims where whole passes are
    empty (w or h < 5) and sub-byte per-pass row packing."""
    from wukong_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(15)
    for ch in (1, 2, 3, 4):
        for h, w in ((1, 1), (3, 7), (5, 5), (24, 18), (9, 1)):
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            out = decode_png(encode_png(px, interlace=True))
            assert np.array_equal(out, px), (ch, h, w)
    for depth in (1, 2, 4, 8):
        n = min(1 << depth, 19)
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (13, 17), dtype=np.uint8)
        out = decode_png(encode_png_palette(idx, pal, depth=depth, interlace=True))
        assert np.array_equal(out, pal[idx]), depth


def test_png_16bit_roundtrip_high_byte():
    """Depth-16 PNG (r9): byte-lane unfiltering reconstructs the
    big-endian sample stream; decode strips to the high byte (libpng
    convention), both sequential and Adam7."""
    from wukong_spark.operators.multimodal import decode_png, encode_png16

    rng = np.random.default_rng(16)
    for ch in (1, 2, 3, 4):
        for h, w in ((1, 1), (5, 7), (13, 17)):
            for inter in (False, True):
                px16 = rng.integers(0, 65536, (h, w, ch), dtype=np.uint16)
                out = decode_png(encode_png16(px16, interlace=inter))
                assert np.array_equal(out, (px16 >> 8).astype(np.uint8)), (
                    ch, h, w, inter,
                )


def test_pnm_family_p4_p5_and_wide_samples():
    """PNM (r9): P5 greymap at 1- and 2-byte sample widths, P4 packed
    bitmap (1 = black), and the P6 16-bit path — all broadcast/rescale
    to RGB uint8 with round-half-up."""
    from wukong_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(17)

    def pnm(magic, w, h, maxval, body):
        head = magic + b"\n%d %d\n" % (w, h)
        if maxval is not None:
            head += b"%d\n" % maxval
        return head + body

    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_ppm(pnm(b"P5", 11, 9, 255, g.tobytes()))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))

    g16 = rng.integers(0, 65536, (5, 6), dtype=np.uint16)
    out = decode_ppm(pnm(b"P5", 6, 5, 65535, g16.astype(">u2").tobytes()))
    exp = np.minimum(
        (g16.astype(np.uint32) * 255 + 32767) // 65535, 255
    ).astype(np.uint8)
    assert np.array_equal(out[:, :, 0], exp)

    bits = rng.integers(0, 2, (7, 13), dtype=np.uint8)
    packed = np.packbits(np.pad(bits, ((0, 0), (0, 3))).astype(bool), axis=1)
    out = decode_ppm(pnm(b"P4", 13, 7, None, packed.tobytes()))
    assert np.array_equal(out[:, :, 0], np.where(bits != 0, 0, 255).astype(np.uint8))
    assert np.array_equal(out[:, :, 0], out[:, :, 2])

    c16 = rng.integers(0, 1001, (4, 5, 3), dtype=np.uint16)
    out = decode_ppm(pnm(b"P6", 5, 4, 1000, c16.astype(">u2").tobytes()))
    exp = np.minimum((c16.astype(np.uint32) * 255 + 500) // 1000, 255).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_image_dhash_properties(spark):
    """dHash (r9): integer-exact, stable under tiny perturbations,
    far apart for unrelated content; the Spark operator emits the same
    hash plus its four 16-bit LSH bands."""
    from wukong_spark.operators.multimodal import (
        dhash_images,
        encode_bmp,
        image_dhash,
        resize_nearest,
    )

    rng = np.random.default_rng(37)
    px = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    h1 = image_dhash(resize_nearest(px, 64, 64))
    near = px.copy()
    near[3, 3] = (near[3, 3].astype(int) + 4) % 256
    d_near = bin(h1 ^ image_dhash(resize_nearest(near, 64, 64))).count("1")
    other = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    d_far = bin(h1 ^ image_dhash(resize_nearest(other, 64, 64))).count("1")
    assert d_near <= 2 < 15 <= d_far
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px)))], "media_id long, payload binary"
    )
    row = dhash_images(df).collect()[0]
    signed = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    assert row.dhash == signed
    assert (row.b0, row.b1, row.b2, row.b3) == (
        (h1 >> 48) & 0xFFFF, (h1 >> 32) & 0xFFFF,
        (h1 >> 16) & 0xFFFF, h1 & 0xFFFF,
    )


def test_audio_fingerprint_bin_exact(spark):
    """Spectral fingerprint (r9): bin-centered tones resolve to their
    exact bins frame-by-frame, surviving the PCM16 codec roundtrip and
    the Spark operator path; short inputs yield zero frames."""
    from wukong_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
        fingerprint_audio,
    )

    sr, n_fft = 16000, 1024
    x = np.concatenate([
        0.6 * np.sin(2 * np.pi * (b * sr / n_fft) * np.arange(sr // 2) / sr)
        for b in (40, 333)
    ])
    fp = audio_fingerprint(x)
    seg = sr // 2
    for i, b in enumerate((40, 333)):
        inner = [
            f for f in range(len(fp))
            if f * 512 >= i * seg and f * 512 + n_fft <= (i + 1) * seg
        ]
        assert {int(fp[f]) for f in inner} == {b}
    assert len(audio_fingerprint(np.zeros(100))) == 0
    df = spark.createDataFrame(
        [(3, bytearray(encode_wav_pcm16(x, sr)))], "media_id long, payload binary"
    )
    rows = fingerprint_audio(df).orderBy("frame_no").collect()
    assert [r.peak_bin for r in rows] == [int(v) for v in fp]
    assert all(r.sample_rate == sr for r in rows)


def test_aifc_compression_types_decode():
    """AIFF-C (r9): 'sowt' (Mac little-endian PCM16), 'NONE', and
    big-endian float32/64 all decode exactly; codec compressions raise."""
    import struct as _s

    from wukong_spark.operators.multimodal import _float_to_f80, decode_aiff

    def aifc(comp, body, bits=16):
        comm = (
            _s.pack(">HIH", 1, 0, bits)
            + _float_to_f80(8000.0)
            + comp
            + b"\x04nam "
        )
        ssnd = _s.pack(">II", 0, 0) + body
        chunks = (
            b"FVER" + _s.pack(">I", 4) + _s.pack(">I", 0xA2805140)
            + b"COMM" + _s.pack(">I", len(comm)) + comm
            + (b"\x00" if len(comm) & 1 else b"")
            + b"SSND" + _s.pack(">I", len(ssnd)) + ssnd
            + (b"\x00" if len(ssnd) & 1 else b"")
        )
        return b"FORM" + _s.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks

    x = np.clip(np.sin(np.arange(500) / 5) * 0.7, -1, 1)
    pcm = np.clip(np.round(x * 32768), -32768, 32767)
    sr, _, got = decode_aiff(aifc(b"sowt", pcm.astype("<i2").tobytes()))
    assert sr == 8000 and np.abs(got - pcm / 32768).max() == 0
    _, _, got = decode_aiff(aifc(b"NONE", pcm.astype(">i2").tobytes()))
    assert np.abs(got - pcm / 32768).max() == 0
    _, _, got = decode_aiff(aifc(b"fl32", x.astype(">f4").tobytes(), bits=32))
    assert np.abs(got - x).max() < 1e-7
    _, _, got = decode_aiff(aifc(b"fl64", x.astype(">f8").tobytes(), bits=64))
    assert np.abs(got - x).max() == 0
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(aifc(b"ima4", b"\x00" * 64))


def test_wav_24bit_pcm_decode():
    """24-bit PCM WAV (r9): little-endian 3-byte signed samples,
    sign-extended exactly; stereo downmixes by channel mean."""
    import io as _io
    import wave as _wave

    from wukong_spark.operators.multimodal import decode_wav

    v = np.clip(
        (np.sin(np.arange(1000) / 7) * 0.6 * 8388608).round(), -8388608, 8388607
    ).astype(np.int64)
    u = np.where(v < 0, v + (1 << 24), v)
    b = np.zeros((1000, 3), np.uint8)
    b[:, 0], b[:, 1], b[:, 2] = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(16000)
        wf.writeframes(b.tobytes())
    sr, nch, x = decode_wav(buf.getvalue())
    assert (sr, nch) == (16000, 1)
    assert np.abs(x - v / 8388608.0).max() == 0.0


def test_png_palette_rejects_bad_indices():
    from wukong_spark.operators.multimodal import decode_png, encode_png_palette

    # indices pointing past the palette must raise, not wrap or crash
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    b = bytearray(encode_png_palette(idx, pal, depth=8, filter_mode="none"))
    # patch a raw index byte inside IDAT is fiddly; instead shrink PLTE:
    # re-encode with a 16-entry palette and indices up to 15, then replace
    # the PLTE chunk with a 2-entry one
    pal16 = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx16 = np.full((4, 4), 15, np.uint8)
    good = encode_png_palette(idx16, pal16, depth=8, filter_mode="none")
    import struct as _s
    import zlib as _z

    i = good.find(b"PLTE") - 4
    (plen,) = _s.unpack_from(">I", good, i)
    small = pal16[:2].tobytes()
    repl = (
        _s.pack(">I", len(small))
        + b"PLTE"
        + small
        + _s.pack(">I", _z.crc32(b"PLTE" + small) & 0xFFFFFFFF)
    )
    bad = good[:i] + repl + good[i + 12 + plen :]
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad)
    assert isinstance(bytes(b), bytes)


def test_bmp_palette_roundtrip_all_bpp():
    from wukong_spark.operators.multimodal import decode_bmp, encode_bmp_palette

    rng = np.random.default_rng(12)
    for bpp in (1, 4, 8):
        for h, w in ((7, 5), (8, 8), (13, 17), (3, 9)):
            n = 2 if bpp == 1 else min(1 << bpp, 23)
            pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            out = decode_bmp(encode_bmp_palette(idx, pal, bpp))
            assert np.array_equal(out, pal[idx]), (bpp, h, w)


def test_ico_palette_bmp_entries_decode():
    """Palette BMP entries inside ICO: the color table must ride along
    into the rebuilt standalone BMP, and the largest entry wins."""
    from wukong_spark.operators.ico import decode_ico, encode_ico_palette

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    small = rng.integers(0, 16, (8, 8), dtype=np.uint8)
    large = rng.integers(0, 16, (24, 18), dtype=np.uint8)
    for bpp in (4, 8):
        out = decode_ico(encode_ico_palette([(small, pal, bpp), (large, pal, bpp)]))
        assert np.array_equal(out, pal[large]), bpp
    mono = decode_ico(encode_ico_palette([(small % 2, pal[:2], 1)]))
    assert np.array_equal(mono, pal[:2][small % 2])


def test_ico_truecolor_entry_with_optimization_color_table():
    """ADVICE r9: a 24-bit BMP entry may carry an optimization color
    table (biClrUsed > 0, legal in BITMAPINFOHEADER); the rebuilt BMP's
    data offset must skip it or pixel rows decode shifted."""
    import struct as _s

    from wukong_spark.operators.ico import decode_ico
    from wukong_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(15)
    px = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    body = bytearray(encode_bmp(px)[14:])  # info header + pixel rows
    _s.pack_into("<i", body, 8, 2 * px.shape[0])  # doubled ICO height
    clr_used = 5
    _s.pack_into("<I", body, 32, clr_used)
    hdr_size = _s.unpack_from("<I", body, 0)[0]
    table = bytes(range(4 * clr_used))  # arbitrary BGRA entries
    body = bytes(body[:hdr_size]) + table + bytes(body[hdr_size:])
    out = bytearray(_s.pack("<HHH", 0, 1, 1))
    out += _s.pack("<BBBBHHII", 7, 10, 0, 0, 1, 24, len(body), 22)
    out += body
    assert np.array_equal(decode_ico(bytes(out)), px)


def test_ico_palette_png_entry_decodes():
    """A palette PNG stored as an ICO entry routes through decode_png
    and drops tRNS alpha like every other path."""
    import struct as _s

    from wukong_spark.operators.ico import decode_ico
    from wukong_spark.operators.multimodal import encode_png_palette

    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (24, 18), dtype=np.uint8)
    png = encode_png_palette(idx, pal, trns=b"\x00\x80", depth=4)
    out = bytearray(_s.pack("<HHH", 0, 1, 1))
    out += _s.pack("<BBBBHHII", 18, 24, 0, 0, 1, 0, len(png), 22)
    out += png
    assert np.array_equal(decode_ico(bytes(out)), pal[idx])


# -- logistic regression (r7: Newton-IRLS, distributed gradient/Hessian) ----


def test_logreg_fit_newton_matches_local_newton(spark):
    from wukong_spark.mlops import logreg_fit_newton, make_classification_blocks

    df = make_classification_blocks(spark, 400, 6, 8, seed=11)
    w, b = logreg_fit_newton(df, l2=1e-2, iters=30)

    # independent driver-local Newton on the same rows, same math
    pdf = df.toPandas().sort_values("sample_id")
    x = np.vstack(pdf["features"].map(np.asarray)).astype(np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    xi = np.hstack([x, np.ones((len(x), 1))])
    wl = np.zeros(xi.shape[1])
    reg = np.eye(xi.shape[1]) * 1e-2
    reg[-1, -1] = 0.0
    for _ in range(30):
        p = 1 / (1 + np.exp(-(xi @ wl)))
        g = xi.T @ (y - p) - reg @ wl
        if np.abs(g).max() / len(y) < 1e-10:
            break
        s = p * (1 - p)
        h = xi.T @ (xi * s[:, None]) + reg + np.eye(xi.shape[1]) * 1e-12
        wl = wl + np.linalg.solve(h, g)
    assert np.allclose(np.append(w, b), wl, atol=1e-8)
    # the fit satisfies first-order optimality on its own
    p = 1 / (1 + np.exp(-(x @ w + b)))
    grad = np.append(x.T @ (y - p) - 1e-2 * w, (y - p).sum())
    assert np.abs(grad).max() / len(y) < 1e-9


def test_softmax_fit_newton_first_order_optimal(spark):
    """K-class softmax Newton: the distributed fit must satisfy the
    regularized multinomial first-order condition to near machine
    precision, and its K=2 special case must agree with the binary
    sigmoid parameterization's decision function."""
    from wukong_spark.mlops import softmax_fit_newton

    rng = np.random.default_rng(21)
    n, d, k = 500, 6, 4
    wtrue = rng.standard_normal((d, k))
    x = rng.standard_normal((n, d))
    y = (x @ wtrue + rng.normal(0, 0.5, (n, k))).argmax(axis=1)
    df = spark.createDataFrame(
        [(list(map(float, xi)), int(yi)) for xi, yi in zip(x, y)],
        "features array<double>, label int",
    ).repartition(5)
    w, b = softmax_fit_newton(df, n_classes=k, l2=1e-3)
    assert w.shape == (d, k) and b.shape == (k,)

    xi = np.hstack([x, np.ones((n, 1))])
    z = xi @ np.vstack([w, b])
    z -= z.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    onehot = np.zeros((n, k))
    onehot[np.arange(n), y] = 1.0
    g = xi.T @ (onehot - p)
    g[:-1] -= 1e-3 * w
    assert np.abs(g).max() / n < 1e-9
    # the fit separates better than chance on its own training data
    assert (p.argmax(axis=1) == y).mean() > 0.5

    # K=2 vs binary logreg: identical decision boundary direction
    from wukong_spark.mlops import logreg_fit_newton

    y2 = (y % 2).astype(int)
    df2 = spark.createDataFrame(
        [(list(map(float, xi_)), int(yi)) for xi_, yi in zip(x, y2)],
        "features array<double>, label int",
    ).repartition(4)
    w2, b2 = softmax_fit_newton(df2, n_classes=2, l2=1e-3)
    wb, bb = logreg_fit_newton(df2.selectExpr("features", "CAST(label AS double) AS label"), l2=1e-3)
    # softmax class-1-minus-class-0 ≈ sigmoid weights (λ splits the
    # weight across the two columns, so compare predictions not params)
    zs = x @ (w2[:, 1] - w2[:, 0]) + (b2[1] - b2[0])
    zb = x @ wb + bb
    assert ((zs >= 0) == (zb >= 0)).mean() > 0.99


# -- JPEG codec (r7: baseline DCT, pure numpy + stdlib) ---------------------


def test_jpeg_q100_roundtrip_error_bounded():
    """Quality 100 → quant tables ≈ 1, so decode(encode(x)) differs only
    by DCT float rounding + the uint8 clamp: ≤ 2 levels on any content."""
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    for shape in ((16, 16), (24, 18), (9, 7), (1, 1)):
        px = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=100, subsampling="444"))
        assert out.shape == px.shape
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 2, shape


def test_jpeg_constant_color_exact():
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.full((17, 13, 3), (200, 50, 120), np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 1, sub


def test_jpeg_smooth_gradient_quality_ladder():
    """Errors shrink as quality rises; q90 on smooth content stays tight."""
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    g = np.add.outer(np.arange(32), np.arange(24)).astype(np.uint8)
    px = np.stack([(g * 3) % 256, (g * 5) % 256, 255 - g], axis=2)
    errs = []
    for q in (50, 75, 90):
        out = decode_jpeg(encode_jpeg(px, quality=q))
        errs.append(np.abs(out.astype(int) - px.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 4.0


def test_jpeg_420_subsampling_smaller_and_close():
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(18)
    # smooth chroma, detailed luma — the content 4:2:0 is designed for
    y = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    px = np.stack([y, y, y], axis=2)  # grey: chroma flat at 128
    b444 = encode_jpeg(px, quality=90, subsampling="444")
    b420 = encode_jpeg(px, quality=90, subsampling="420")
    assert len(b420) < len(b444)
    out = decode_jpeg(b420)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 12.0


def test_jpeg_rejects_unsupported_modes():
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 to SOF3 (lossless) in a valid stream → NotImplementedError
    b = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="baseline sequential and progressive"):
        decode_jpeg(bytes(b))
    # flip to SOF2: now parsed as progressive, but the baseline SOS header
    # (Ss=0, Se=63) is not a legal progressive scan → ValueError
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(b))


def test_decode_images_real_jpeg_end_to_end(spark):
    from wukong_spark.operators.jpeg import encode_jpeg

    px = np.full((16, 16, 3), (10, 200, 90), np.uint8)
    payload = encode_jpeg(px, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = decode_images(df, height=16, width=16).collect()[0]
    got = np.array(row.pixels, np.uint8).reshape(16, 16, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_restart_intervals_decode_identically():
    """DRI + RSTn markers (r9 encoder support): restart intervals change
    the bitstream (byte-aligned markers, DC predictor resets) but NOT
    the coefficients, so decode must be bit-identical to the marker-free
    encoding — pinning the decoder's align-to-marker and predictor-reset
    paths with real streams."""
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(19)
    for h, w in ((24, 18), (33, 47)):
        for sub in ("444", "420"):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(px, quality=85, subsampling=sub))
            for ri in (1, 3, 7):
                b = encode_jpeg(px, quality=85, subsampling=sub, restart_interval=ri)
                assert b"\xff\xdd" in b  # DRI present
                assert np.array_equal(decode_jpeg(b), base), (h, w, sub, ri)


# -- progressive JPEG (r9: SOF2 multi-scan decode + 10-scan encoder) --------


def test_jpeg_progressive_bit_identical_to_baseline():
    """Progressive transmission is lossless over the quantized
    coefficients, so decoding the progressive bytes must match the
    baseline decode of the same image BIT-FOR-BIT — across odd dims
    (MCU padding), both chroma modes, and the quality range."""
    from wukong_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    for h, w in ((8, 8), (24, 18), (17, 23), (33, 7)):
        for sub in ("444", "420"):
            for q in (25, 90, 100):
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                base = decode_jpeg(encode_jpeg(px, quality=q, subsampling=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(px, quality=q, subsampling=sub)
                )
                assert np.array_equal(base, prog), (h, w, sub, q)


def test_jpeg_progressive_eob_runs_and_smooth_content():
    """Constant / smooth content drives multi-block EOB runs (EOBn with
    n ≥ 1) through both the encoder accumulation and the decoder's
    run-skip + refinement-tail paths."""
    from wukong_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:120, 0:90]
    smooth = np.clip(
        yy[..., None] + xx[..., None] + rng.normal(0, 8, (120, 90, 3)), 0, 255
    ).astype(np.uint8)
    for px in (np.full((48, 48, 3), 77, np.uint8), smooth):
        for sub in ("444", "420"):
            b = encode_jpeg_progressive(px, quality=75, subsampling=sub)
            assert b"\xff\xc2" in b  # really SOF2
            assert np.array_equal(
                decode_jpeg(b),
                decode_jpeg(encode_jpeg(px, quality=75, subsampling=sub)),
            )


def test_jpeg_exif_orientation_applied():
    """EXIF orientation (r9): the decoder must upright all 8 orientations
    (web/camera JPEGs carry rotation as metadata, not pixels), swap dims
    for the transposing ones, and fall back to orientation 1 on
    malformed EXIF rather than failing the decode."""
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(33)
    px = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=90))
    t = base.transpose(1, 0, 2)
    expected = {
        1: base, 2: base[:, ::-1], 3: base[::-1, ::-1], 4: base[::-1],
        5: t, 6: t[:, ::-1], 7: t[::-1, ::-1], 8: t[::-1],
    }
    for o in range(1, 9):
        got = decode_jpeg(encode_jpeg(px, quality=90, exif_orientation=o))
        assert np.array_equal(got, expected[o]), o
        if o >= 5:
            assert got.shape == (18, 24, 3), o
    # malformed EXIF (bad byte-order mark) must not fail the decode
    b = bytearray(encode_jpeg(px, quality=90, exif_orientation=6))
    b[bytes(b).find(b"Exif") + 6] = 0x58
    assert np.array_equal(decode_jpeg(bytes(b)), base)


def test_jpeg_progressive_restart_intervals():
    """Progressive + DRI (r9): restart boundaries flush EOB runs and
    reset DC predictors per scan; decode must stay bit-identical to the
    marker-free progressive AND baseline encodings — including smooth
    content where boundaries land mid-EOB-run."""
    from wukong_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(27)
    for sub in ("444", "420"):
        px = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=85, subsampling=sub))
        for ri in (1, 2, 5):
            b = encode_jpeg_progressive(
                px, quality=85, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in b
            assert np.array_equal(decode_jpeg(b), base), (sub, ri)
    g = np.tile(np.arange(48, dtype=np.uint8)[None, :, None], (40, 1, 3))
    for ri in (1, 3):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(g, restart_interval=ri)),
            decode_jpeg(encode_jpeg(g)),
        ), ri


def test_jpeg_progressive_grayscale_single_component_scans():
    """Handcrafted single-component (grayscale) progressive stream: a
    non-interleaved DC scan + an AC band scan whose EOB1 symbol covers
    all three blocks.  Pins the exact EOBn run-length arithmetic
    (run = 2^n + extra) and the grayscale broadcast."""
    import struct

    from wukong_spark.operators.jpeg import (
        _STD_DC_LUMA,
        _BitWriter,
        _canonical_codes,
        _magnitude_bits,
        _seg,
        decode_jpeg,
    )

    # 24×8 constant gray 100 → level shift −28 → DC = −224 (unit quant)
    qt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00] + _STD_DC_LUMA[0] + _STD_DC_LUMA[1])
    ac_bits, ac_vals = [0, 2] + [0] * 14, [0x00, 0x10]
    dht_ac = bytes([0x10] + ac_bits + ac_vals)

    bw = _BitWriter()
    dc_codes = _canonical_codes(*_STD_DC_LUMA)
    cat, bits = _magnitude_bits(-224)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    bw.write(bits, cat)
    for _ in range(2):  # two zero diffs
        code, ln = dc_codes[0]
        bw.write(code, ln)
    dc_scan = bw.flush()

    bw = _BitWriter()
    code, ln = _canonical_codes(ac_bits, ac_vals)[0x10]
    bw.write(code, ln)  # EOB1: run = 2 + extra
    bw.write(1, 1)  # extra bit 1 → run covers all 3 blocks
    ac_scan = bw.flush()

    payload = (
        b"\xff\xd8"
        + _seg(0xFFDB, qt)
        + _seg(0xFFC2, sof)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + dc_scan
        + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + ac_scan
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 24, 3)
    assert (out == 100).all()


def test_jpeg_optimal_huffman_tables_valid():
    """Per-scan optimal tables must be canonical-valid: lengths ≤ 16,
    prefix-free, and the all-ones code left unassigned (strict Kraft
    inequality) so 1-padding can't alias a symbol.  Fibonacci
    frequencies force depths > 16 through the T.81 K.3 fold."""
    from wukong_spark.operators.jpeg import (
        _canonical_codes,
        _decode_map,
        _optimal_table,
    )

    rng = np.random.default_rng(5)
    fib = [1, 1]
    while len(fib) < 25:
        fib.append(fib[-1] + fib[-2])
    cases = [{i: f for i, f in enumerate(fib)}, {7: 3}]
    # ADVICE r9: depths > 32 (Fibonacci ladder past ~3.5M coded symbols)
    # must trigger libjpeg-style frequency halving, not an AssertionError
    while len(fib) < 48:
        fib.append(fib[-1] + fib[-2])
    cases.append({i: f for i, f in enumerate(fib)})
    for _ in range(100):
        syms = rng.choice(256, size=int(rng.integers(1, 60)), replace=False)
        cases.append({int(s): int(rng.integers(1, 10000)) for s in syms})
    for freq in cases:
        bits, vals = _optimal_table(freq)
        assert sum(bits) == len(freq)
        assert sorted(vals) == sorted(freq)
        codes = _canonical_codes(bits, vals)
        kraft = 0
        for _, (c, ln) in codes.items():
            assert 1 <= ln <= 16 and c < (1 << ln)
            kraft += 1 << (16 - ln)
        assert kraft < (1 << 16)  # strict: all-ones code reserved
        assert len(_decode_map(bits, vals)) == len(freq)


def test_decode_images_real_progressive_jpeg_end_to_end(spark):
    from wukong_spark.operators.jpeg import encode_jpeg_progressive

    px = np.full((16, 16, 3), (10, 200, 90), np.uint8)
    payload = encode_jpeg_progressive(px, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = decode_images(df, height=16, width=16).collect()[0]
    got = np.array(row.pixels, np.uint8).reshape(16, 16, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1


# -- GIF codec (r7: LZW + palette + interlace, pure numpy + stdlib) ---------


def test_gif_lzw_roundtrip_all_code_sizes():
    from wukong_spark.operators.gif import lzw_compress, lzw_decompress

    rng = np.random.default_rng(21)
    for mcs in (2, 3, 4, 8):
        for n in (0, 1, 7, 4096, 20000):  # 20000 random forces table-full clears
            idx = rng.integers(0, 1 << mcs, size=n).astype(np.uint8)
            got = lzw_decompress(lzw_compress(idx, mcs), mcs, n)
            assert np.array_equal(got, idx), (mcs, n)


def test_gif_roundtrip_palettes_and_interlace():
    from wukong_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(22)
    for npal, shape in ((256, (33, 47)), (16, (8, 8)), (2, (64, 64)), (5, (1, 1))):
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=shape, dtype=np.uint8)
        for inter in (False, True):
            out = decode_gif(encode_gif(idx, pal, interlace=inter))
            assert np.array_equal(out, pal[idx]), (npal, shape, inter)


def test_gif_repetitive_content_compresses():
    """Real LZW, not a stored format: repetitive indices shrink well below
    raw size and still roundtrip exactly."""
    from wukong_spark.operators.gif import decode_gif, encode_gif

    idx = np.tile(np.arange(8, dtype=np.uint8), (64, 8))  # 64×64, repeating
    pal = np.arange(256 * 3, dtype=np.uint16).reshape(256, 3).astype(np.uint8)[:8]
    b = encode_gif(idx, pal)
    assert len(b) < idx.size // 2
    assert np.array_equal(decode_gif(b), pal[idx])


def test_gif_skips_extension_blocks():
    """GIF89a extension blocks (GCE/comment) before the image descriptor
    must be skipped structurally."""
    from wukong_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(5, 6), dtype=np.uint8)
    b = bytearray(encode_gif(idx, pal))
    # splice a Graphic Control Extension + comment after the screen block
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    comment = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    insert_at = 13 + 4 * 3  # header + LSD + 4-entry (padded) GCT
    spliced = bytes(b[:insert_at]) + gce + comment + bytes(b[insert_at:])
    assert np.array_equal(decode_gif(spliced), pal[idx])


def test_gif_rejects_invalid():
    from wukong_spark.operators.gif import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"not a gif at all")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # trailer, no image


def test_decode_images_real_gif_end_to_end(spark):
    from wukong_spark.operators.gif import encode_gif

    rng = np.random.default_rng(24)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 8), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(idx, pal)))], "media_id long, payload binary"
    )
    row = decode_images(df, height=8, width=8).collect()[0]
    got = np.array(row.pixels, np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, pal[idx])


# -- G.711 + float WAV decode (r7) ------------------------------------------


def test_g711_codecs_bit_identical_to_audioop():
    """Pin both companding codecs against CPython's audioop (the vendored
    Sun g711.c reference) over every int16 input and every code byte."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from wukong_spark.operators.multimodal import (
        _alaw_to_linear,
        _linear_to_alaw,
        _linear_to_ulaw,
        _ulaw_to_linear,
    )

    s = np.arange(-32768, 32768, dtype=np.int16)
    assert np.array_equal(
        _linear_to_ulaw(s), np.frombuffer(audioop.lin2ulaw(s.tobytes(), 2), np.uint8)
    )
    assert np.array_equal(
        _linear_to_alaw(s), np.frombuffer(audioop.lin2alaw(s.tobytes(), 2), np.uint8)
    )
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        _ulaw_to_linear(codes),
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), np.int16),
    )
    assert np.array_equal(
        _alaw_to_linear(codes),
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), np.int16),
    )


def test_wav_g711_and_float_roundtrip_local():
    from wukong_spark.operators.multimodal import (
        decode_wav,
        encode_wav_float32,
        encode_wav_g711,
    )

    sr = 8000
    t = np.arange(sr // 4) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    for law in ("ulaw", "alaw"):
        gsr, nch, got = decode_wav(encode_wav_g711(x, sr, law))
        assert (gsr, nch) == (sr, 1)
        # G.711 is ~13-bit log quantization: worst step at 0.4 FS ≈ 2^-7
        assert np.abs(got - x).max() < 0.01, law
    gsr, nch, got = decode_wav(encode_wav_float32(x, sr))
    assert np.abs(got - x).max() < 1e-7


def test_decode_audio_g711_end_to_end(spark):
    from wukong_spark.operators.multimodal import decode_audio, encode_wav_g711

    sr = 8000
    t = np.arange(sr // 8) / sr
    x = 0.3 * np.sin(2 * np.pi * 300 * t)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_g711(x, sr, "ulaw"))),
         (2, bytearray(encode_wav_g711(x, sr, "alaw")))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in decode_audio(df).collect()}
    for mid in (1, 2):
        assert out[mid].sample_rate == sr
        assert abs(out[mid].rms - float(np.sqrt(np.mean(x**2)))) < 0.01


# -- decoder robustness at corpus scale (r7) --------------------------------


def test_decode_dims_guard_rejects_allocation_bombs():
    """A few corrupt header bytes can declare multi-gigapixel dims; every
    decoder must reject BEFORE allocating the pixel buffer."""
    import struct as _s
    import zlib as _z

    from wukong_spark.operators.gif import decode_gif, encode_gif
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from wukong_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_bmp,
        decode_png,
        decode_ppm,
        encode_bmp,
    )

    # PNG claiming 50000x50000
    ihdr = _s.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    bomb = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_png(bomb)

    # BMP with patched 60000x60000 dims
    b = bytearray(encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    _s.pack_into("<ii", b, 18, 60000, 60000)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_bmp(bytes(b))

    # PPM header bomb
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_ppm(b"P6\n70000 70000\n255\n\x00")

    # JPEG SOF with patched dims
    j = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(j).find(b"\xff\xc0")
    _s.pack_into(">HH", j, i + 5, 65000, 65000)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_jpeg(bytes(j))

    # GIF image descriptor with patched dims (max u16 is 65535 -> 4.3 Gpx)
    g = bytearray(encode_gif(np.zeros((4, 4), np.uint8), np.zeros((2, 3), np.uint8)))
    i = bytes(g).find(b"\x2c")
    _s.pack_into("<HH", g, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_gif(bytes(g))


def test_decoders_fail_cleanly_on_fuzzed_payloads():
    """Random bytes behind each magic must raise (ValueError /
    NotImplementedError / parse errors) promptly — never hang, never
    return garbage silently.  Catching `Exception` is deliberate: the
    contract under fuzz is 'raises, fast', and _decode_pixels converts
    any failure into the fake_decoder/raise path."""
    from wukong_spark.operators.gif import decode_gif
    from wukong_spark.operators.jpeg import decode_jpeg
    from wukong_spark.operators.multimodal import PNG_MAGIC, decode_bmp, decode_png

    rng = np.random.default_rng(77)
    for trial in range(50):
        junk = rng.integers(0, 256, size=rng.integers(0, 400), dtype=np.uint8).tobytes()
        for magic, dec in (
            (PNG_MAGIC, decode_png),
            (b"\xff\xd8", decode_jpeg),
            (b"GIF89a", decode_gif),
            (b"BM", decode_bmp),
        ):
            try:
                out = dec(magic + junk)
                # a successful parse of junk must still be a sane image
                assert out.ndim == 3 and out.shape[0] * out.shape[1] <= 64 * 1024 * 1024
            except Exception:
                pass  # expected: clean failure


def test_gif_animation_compositing_semantics():
    """extract_gif_frames (r9): partial rectangles, transparency holes,
    and all disposal methods — each frame is the fully composited canvas
    with exact palette colors."""
    from wukong_spark.operators.gif import (
        decode_gif,
        encode_gif,
        encode_gif_animation,
        extract_gif_frames,
    )

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    f1 = rng.integers(0, 16, (10, 12), dtype=np.uint8)
    f2 = rng.integers(0, 16, (4, 5), dtype=np.uint8)
    f3 = rng.integers(0, 16, (3, 3), dtype=np.uint8)
    f4 = rng.integers(0, 16, (2, 2), dtype=np.uint8)
    b = encode_gif_animation(
        [
            (f1, 0, 0, None, 1),  # full draw, keep
            (f2, 3, 2, 7, 2),  # partial + transparency, then restore-bg
            (f3, 1, 1, None, 3),  # draw, then restore-previous
            (f4, 8, 7, None, 0),
        ],
        pal,
    )
    frames = extract_gif_frames(b)
    assert len(frames) == 4
    c = np.empty((10, 12, 3), np.uint8)
    c[:] = pal[f1]
    assert np.array_equal(frames[0], c)
    c2 = c.copy()
    reg, px, m = c2[2:6, 3:8], pal[f2], f2 != 7
    reg[m] = px[m]  # transparency leaves prior pixels
    assert np.array_equal(frames[1], c2)
    c3 = c2.copy()
    c3[2:6, 3:8] = pal[0]  # disposal 2 restored to background
    pre3 = c3.copy()
    c3[1:4, 1:4] = pal[f3]
    assert np.array_equal(frames[2], c3)
    c4 = pre3.copy()  # disposal 3 restored the pre-f3 canvas
    c4[7:9, 8:10] = pal[f4]
    assert np.array_equal(frames[3], c4)
    # first-frame API unchanged; single-frame stills extract as 1 frame
    assert np.array_equal(decode_gif(b), pal[f1])
    assert len(extract_gif_frames(encode_gif(f1, pal))) == 1


def test_gif_sampling_is_memory_bounded_and_consistent():
    """sample_gif_frames must agree with the retain-everything API on
    the picked frames while holding only O(n_frames) canvases; the
    structural counter sees every frame without LZW-decoding any."""
    from wukong_spark.operators.gif import (
        count_gif_frames,
        encode_gif_animation,
        extract_gif_frames,
        sample_gif_frames,
    )

    rng = np.random.default_rng(35)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    entries = [(rng.integers(0, 8, (10, 10), dtype=np.uint8), 0, 0, None, 1)]
    for f in range(1, 20):
        entries.append(
            (rng.integers(0, 8, (3, 3), dtype=np.uint8),
             f % 7, (f * 2) % 7, 3 if f % 3 == 0 else None, f % 4)
        )
    b = encode_gif_animation(entries, pal, screen=(10, 10))
    assert count_gif_frames(b) == 20
    allf = extract_gif_frames(b)
    sampled = sample_gif_frames(b, 3)
    assert [fn for fn, _ in sampled] == [0, 9, 19]
    for fn, px in sampled:
        assert np.array_equal(px, allf[fn]), fn


def test_frame_sample_animated_gif_end_to_end(spark):
    from wukong_spark.operators.gif import encode_gif_animation
    from wukong_spark.operators.multimodal import frame_sample

    rng = np.random.default_rng(32)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    entries = [(rng.integers(0, 8, (12, 10), dtype=np.uint8), 0, 0, None, 1)]
    for f in range(1, 5):
        entries.append(
            (rng.integers(0, 8, (4, 4), dtype=np.uint8), f, f, None, 1)
        )
    b = encode_gif_animation(entries, pal, screen=(10, 12))
    df = spark.createDataFrame(
        [(9, bytearray(b))], "media_id long, payload binary"
    )
    rows = frame_sample(df, n_frames=3).orderBy("frame_idx").collect()
    assert [r.frame_no for r in rows] == [0, 2, 4]
    assert all(r.sum_r > 0 for r in rows)


# -- MJPEG AVI video (r7: real container walk + JPEG frame decode) ----------


def test_mjpeg_avi_roundtrip_local():
    from wukong_spark.operators.video import (
        count_frames,
        encode_mjpeg_avi,
        extract_frames,
        probe_avi,
    )

    rng = np.random.default_rng(31)
    frames = [
        np.full((16, 20, 3), (10 * i, 200 - 10 * i, 50 + 5 * i), np.uint8)
        for i in range(6)
    ]
    b = encode_mjpeg_avi(frames, fps=5, quality=95)
    info = probe_avi(b)
    assert (info["width"], info["height"], info["fourcc"]) == (20, 16, "MJPG")
    assert info["n_frames"] == 6 and count_frames(b) == 6
    got = extract_frames(b)
    for i, (fn, px) in enumerate(got):
        assert fn == i
        assert np.abs(px.astype(int) - frames[i].astype(int)).max() <= 1
    assert [fn for fn, _ in extract_frames(b, [0, 3, 5])] == [0, 3, 5]


def test_mjpeg_avi_rejects_non_mjpg():
    from wukong_spark.operators.video import encode_mjpeg_avi, extract_frames

    b = bytearray(encode_mjpeg_avi([np.zeros((8, 8, 3), np.uint8)]))
    # corrupt the frame payload so it no longer starts with the JPEG magic
    i = bytes(b).find(b"00dc")
    b[i + 8 : i + 10] = b"XX"
    with pytest.raises(NotImplementedError, match="MJPG"):
        extract_frames(bytes(b))


def test_frame_sample_real_mjpeg_end_to_end(spark):
    from wukong_spark.operators.video import encode_mjpeg_avi

    frames = [np.full((8, 8, 3), (i * 30, 100, 255 - i * 30), np.uint8) for i in range(5)]
    df = spark.createDataFrame(
        [(7, bytearray(encode_mjpeg_avi(frames, quality=95)))],
        "media_id long, payload binary",
    )
    out = frame_sample(df, n_frames=3).toPandas().sort_values("frame_idx")
    assert list(out["frame_no"]) == [0, 2, 4]  # evenly spaced over 5 frames
    for _, row in out.iterrows():
        want = frames[int(row["frame_no"])]
        assert abs(row["sum_r"] - int(want[..., 0].astype(np.int64).sum())) <= 64


def test_gif_lzw_deferred_clear_interop():
    """Foreign GIF encoders may FREEZE the table at 4096 (deferred clear)
    instead of emitting a clear code; the decoder must freeze in lockstep
    or code assignment drifts.  Simulate such an encoder inline."""
    from wukong_spark.operators.gif import _LSBWriter, _lzw_width, lzw_decompress

    mcs = 4
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    rng = np.random.default_rng(41)
    idx = rng.integers(0, 1 << mcs, 30000).astype(np.uint8)

    bw = _LSBWriter()
    table, next_code = {}, eoi + 2
    bw.write(clear, mcs + 1)
    it = iter(int(x) for x in idx)
    cur = next(it)
    next_code = eoi + 1
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        bw.write(cur, min(12, _lzw_width(next_code - 1, mcs)))
        if next_code < 4096:  # freeze, never clear
            table[(cur, k)] = next_code
            next_code += 1
        cur = k
    bw.write(cur, min(12, _lzw_width(next_code - 1, mcs)))
    bw.write(eoi, min(12, _lzw_width(next_code, mcs)))
    got = lzw_decompress(bw.flush(), mcs, len(idx))
    assert np.array_equal(got, idx)


# -- TIFF codec (r7: IFD walk, strips, PackBits) ----------------------------


def test_tiff_roundtrip_channels_strips_compressions():
    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(61)
    for ch in (1, 3, 4):
        for shape in ((24, 18), (7, 5), (40, 3), (1, 1)):
            px = rng.integers(0, 256, size=shape + (ch,), dtype=np.uint8)
            for comp in ("none", "packbits"):
                out = decode_tiff(encode_tiff(px, compression=comp, rows_per_strip=10))
                assert np.array_equal(out, px), (ch, shape, comp)


def test_tiff_packbits_roundtrip_and_compression():
    from wukong_spark.operators.tiff import packbits_decode, packbits_encode

    rng = np.random.default_rng(62)
    # genuinely runny data: 50 runs of 100 identical bytes each
    runs = b"".join(bytes([v]) * 100 for v in rng.integers(0, 256, 50))
    enc = packbits_encode(runs)
    assert len(enc) < len(runs) // 10
    assert packbits_decode(enc, len(runs)) == runs
    noise = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    assert packbits_decode(packbits_encode(noise), 5000) == noise


def test_tiff_deflate_and_predictor_roundtrip():
    """Deflate TIFF (r9): per-strip zlib inflate, with and without
    predictor 2 (horizontal differencing) — decode must equal the
    uncompressed encoding of the same pixels exactly."""
    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(23)
    for ch in (1, 3, 4):
        for h, w in ((7, 5), (16, 16), (33, 9)):
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            base = decode_tiff(encode_tiff(px, compression="none"))
            for pred in (False, True):
                b = encode_tiff(
                    px, compression="deflate", rows_per_strip=6, predictor=pred
                )
                assert np.array_equal(decode_tiff(b), base), (ch, h, w, pred)
    # a smooth gradient must actually compress under deflate+predictor
    g = np.tile(np.arange(200, dtype=np.uint8)[None, :, None], (100, 1, 3))
    plain = encode_tiff(g, compression="none")
    packed = encode_tiff(g, compression="deflate", predictor=True)
    assert len(packed) < len(plain) // 4


def test_tiff_lzw_literal_spec_vectors():
    """TIFF LZW width-convention pin (r10): hand-derived byte vectors
    from the TIFF 6.0 algorithm (MSB-first, Clear=256, EOI=257, 9-bit
    start).  Input [7,7,7,8] → codes [256, 7, 258, 8, 257] all at 9
    bits → bits 100000000 000000111 100000010 000001000 100000001 →
    bytes 80 01 E0 40 88 08 (zero-padded).  This stream never crosses
    the 510-entry boundary, so BOTH conventions must produce and accept
    it identically; the boundary test below pins where they diverge."""
    from wukong_spark.operators.tiff import (
        tiff_lzw_compress,
        tiff_lzw_decompress,
    )

    vec = bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
    for ec in (True, False):
        assert tiff_lzw_compress(bytes([7, 7, 7, 8]), early_change=ec) == vec
        assert tiff_lzw_decompress(vec, 4, early_change=ec) == bytes([7, 7, 7, 8])
    # empty stream: Clear then EOI, both 9-bit -> 100000000 100000001
    assert tiff_lzw_compress(b"") == bytes([0x80, 0x40, 0x40])


def test_tiff_lzw_early_change_boundary():
    """The conventions differ EXACTLY at the 9→10-bit switch: with
    EarlyChange (TIFF 6.0/libtiff) the decoder reads 10-bit codes once
    its next free slot is 511; late-change (old encoders) switches at
    512.  A stream of 260 distinct non-repeating bytes pushes the table
    past the boundary: the two encoders must diverge, each must
    roundtrip with its own decoder, and cross-convention decode must
    NOT reproduce the input."""
    from wukong_spark.operators.tiff import (
        tiff_lzw_compress,
        tiff_lzw_decompress,
    )

    rng = np.random.default_rng(63)
    data = bytes(rng.integers(0, 256, 2000, dtype=np.uint8))
    early = tiff_lzw_compress(data, early_change=True)
    late = tiff_lzw_compress(data, early_change=False)
    assert early != late
    assert len(early) == len(late) + 1  # one extra bit region, padded
    assert tiff_lzw_decompress(early, len(data), early_change=True) == data
    assert tiff_lzw_decompress(late, len(data), early_change=False) == data
    for enc, dec_ec in ((early, False), (late, True)):
        try:
            got = tiff_lzw_decompress(enc, len(data), early_change=dec_ec)
            assert got != data
        except ValueError:
            pass  # desync may also surface as an invalid code / truncation


def test_tiff_lzw_roundtrip_sweep():
    """Roundtrip torture: run lengths (KwKwK), tiny alphabets, full-byte
    noise, table-reset crossings (>4093 entries), both conventions."""
    from wukong_spark.operators.tiff import (
        tiff_lzw_compress,
        tiff_lzw_decompress,
    )

    rng = np.random.default_rng(64)
    cases = [
        b"",
        b"\x00",
        b"\x07" * 1000,  # KwKwK ladder
        bytes([7, 7, 7, 8]),
        bytes(rng.integers(0, 2, 3000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),  # table resets
        np.tile(np.arange(256, dtype=np.uint8), 40).tobytes(),
    ]
    for d in cases:
        for ec in (True, False):
            c = tiff_lzw_compress(d, early_change=ec)
            assert tiff_lzw_decompress(c, len(d), early_change=ec) == d
    # compressible input must actually compress
    runs = b"".join(bytes([v]) * 200 for v in range(30))
    assert len(tiff_lzw_compress(runs)) < len(runs) // 4


def test_tiff_lzw_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wukong_spark.operators.tiff import (
        tiff_lzw_compress,
        tiff_lzw_decompress,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4096), st.booleans())
    def roundtrip(d, ec):
        assert tiff_lzw_decompress(
            tiff_lzw_compress(d, early_change=ec), len(d), early_change=ec
        ) == d

    roundtrip()


def test_tiff_lzw_end_to_end_with_predictor():
    """encode_tiff(compression='lzw') → decode_tiff must be lossless for
    every channel count, with and without predictor 2."""
    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(65)
    for ch in (1, 3, 4):
        for h, w in ((7, 5), (24, 18), (33, 9)):
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            base = decode_tiff(encode_tiff(px, compression="none"))
            for pred in (False, True):
                b = encode_tiff(
                    px, compression="lzw", rows_per_strip=6, predictor=pred
                )
                assert np.array_equal(decode_tiff(b), base), (ch, h, w, pred)
    # gradient must compress under lzw+predictor
    g = np.tile(np.arange(200, dtype=np.uint8)[None, :, None], (100, 1, 3))
    assert len(encode_tiff(g, compression="lzw", predictor=True)) < len(
        encode_tiff(g, compression="none")
    ) // 4


def test_tiff_white_is_zero_inverts():
    """Photometric 0 (white-is-zero) greyscale must invert on decode."""
    import struct as _s

    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    b = bytearray(encode_tiff(px))
    # patch the photometric tag (262) value from 1 to 0
    i = bytes(b).find(_s.pack("<HHII", 262, 3, 1, 1))
    assert i > 0
    b[i : i + 12] = _s.pack("<HHII", 262, 3, 1, 0)
    out = decode_tiff(bytes(b))
    assert np.array_equal(out[:, :, 0], 255 - px)


def test_tiff_rejects_unsupported_and_bombs():
    import struct as _s

    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff")
    b = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint8)))
    # patch compression tag to JPEG-in-TIFF (7) — LZW (5) decodes since r10
    i = bytes(b).find(_s.pack("<HHII", 259, 3, 1, 1))
    b2 = bytearray(b)
    b2[i : i + 12] = _s.pack("<HHII", 259, 3, 1, 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(b2))
    # dimension bomb
    j = bytes(b).find(_s.pack("<HHII", 256, 4, 1, 4))
    b3 = bytearray(b)
    b3[j : j + 12] = _s.pack("<HHII", 256, 4, 1, 100_000)
    k = bytes(b).find(_s.pack("<HHII", 257, 4, 1, 4))
    b3[k : k + 12] = _s.pack("<HHII", 257, 4, 1, 100_000)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_tiff(bytes(b3))


def test_decode_images_real_tiff_end_to_end(spark):
    from wukong_spark.operators.tiff import encode_tiff

    rng = np.random.default_rng(63)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_tiff(px, compression="packbits")))],
        "media_id long, payload binary",
    )
    row = decode_images(df, height=8, width=8).collect()[0]
    got = np.array(row.pixels, np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, px)


# -- Sun AU + AIFF audio (r7) -----------------------------------------------


def test_au_roundtrip_and_signed_pcm8():
    from wukong_spark.operators.multimodal import decode_au, encode_au

    sr = 8000
    t = np.arange(sr // 4) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    for enc, tol in (("ulaw", 0.01), ("pcm16", 1 / 32000)):
        gsr, nch, y = decode_au(encode_au(x, sr, enc))
        assert (gsr, nch) == (sr, 1)
        assert np.abs(y - x).max() < tol, enc
    # hand-built signed-PCM8 AU (encoding 2)
    import struct as _s

    pcm8 = np.clip(np.round(x * 128), -128, 127).astype(np.int8)
    b = b".snd" + _s.pack(">IIIII", 24, len(pcm8), 2, sr, 1) + pcm8.tobytes()
    _, _, y8 = decode_au(b)
    assert np.abs(y8 - x).max() < 1 / 100
    with pytest.raises(NotImplementedError):
        decode_au(b".snd" + _s.pack(">IIIII", 24, 4, 27, sr, 1) + b"\x00" * 4)


def test_aiff_roundtrip_and_f80():
    from wukong_spark.operators.multimodal import (
        _f80_to_float,
        _float_to_f80,
        decode_aiff,
        encode_aiff_pcm16,
    )

    for v in (8000.0, 16000.0, 22050.0, 44100.0, 48000.0, 96000.0):
        assert abs(_f80_to_float(_float_to_f80(v)) - v) < 1e-9 * v
    sr = 44100
    t = np.arange(sr // 10) / sr
    x = 0.3 * np.sin(2 * np.pi * 1000 * t)
    gsr, nch, y = decode_aiff(encode_aiff_pcm16(x, sr))
    assert (gsr, nch) == (sr, 1)
    assert np.abs(y - x).max() < 1 / 32000
    with pytest.raises(ValueError):
        decode_aiff(b"FORMxxxxNOPE")


def test_decode_audio_au_aiff_end_to_end(spark):
    from wukong_spark.operators.multimodal import (
        decode_audio,
        encode_aiff_pcm16,
        encode_au,
    )

    sr = 8000
    t = np.arange(sr // 8) / sr
    x = 0.3 * np.sin(2 * np.pi * 300 * t)
    df = spark.createDataFrame(
        [(1, bytearray(encode_au(x, sr, "ulaw"))),
         (2, bytearray(encode_au(x, sr, "pcm16"))),
         (3, bytearray(encode_aiff_pcm16(x, sr)))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in decode_audio(df).collect()}
    for mid in (1, 2, 3):
        assert out[mid].sample_rate == sr
        assert abs(out[mid].rms - float(np.sqrt(np.mean(x**2)))) < 0.01


# -- ICO codec (r7: directory walk over PNG/BMP entries) --------------------


def test_ico_roundtrip_png_and_bmp_entries():
    from wukong_spark.operators.ico import decode_ico, encode_ico, is_ico

    rng = np.random.default_rng(71)
    imgs = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
        rng.integers(0, 256, (32, 24, 3), dtype=np.uint8),
    ]
    for as_png in (True, False):
        b = encode_ico(imgs, as_png=as_png)
        assert is_ico(b)
        out = decode_ico(b)  # largest entry wins
        assert np.array_equal(out, imgs[1]), as_png
    assert not is_ico(b"\x01\x02\x03\x04\x05\x06")
    with pytest.raises(ValueError):
        decode_ico(b"nope")


def test_decode_images_real_ico_end_to_end(spark):
    from wukong_spark.operators.ico import encode_ico

    rng = np.random.default_rng(72)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ico([px], as_png=True))),
         (2, bytearray(encode_ico([px], as_png=False)))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in decode_images(df, height=16, width=16).collect()}
    for mid in (1, 2):
        got = np.array(out[mid].pixels, np.uint8).reshape(16, 16, 3)
        assert np.array_equal(got, px), mid


def test_augment_images_deterministic(spark):
    """augment_images (r11): same (sample, epoch) → identical pixels on
    re-run and under different partitioning; different epochs diverge
    for at least one image; output dims shrink by the crop margin."""
    import numpy as np
    from wukong_spark.operators.multimodal import augment_images, encode_bmp, decode_images

    def gen_df(parts):
        import pandas as pd
        rows = []
        for k in range(6):
            px = np.random.default_rng(900 + k).integers(
                0, 256, (12, 10, 3), dtype=np.uint8
            )
            rows.append((k, bytearray(encode_bmp(px))))
        pdf = pd.DataFrame(rows, columns=["media_id", "payload"])
        return spark.createDataFrame(pdf).repartition(parts)

    dec1 = decode_images(gen_df(2), height=12, width=10)
    dec2 = decode_images(gen_df(5), height=12, width=10)

    def snap(df, epoch):
        return {
            r["media_id"]: (r["height"], r["width"], tuple(r["pixels"]))
            for r in augment_images(df, epoch=epoch).collect()
        }

    a = snap(dec1, 1)
    b = snap(dec2, 1)  # different partitioning, same epoch
    assert a == b
    assert all(v[0] == 10 and v[1] == 8 for v in a.values())
    c = snap(dec1, 2)
    assert any(a[k] != c[k] for k in a)
