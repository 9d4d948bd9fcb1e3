"""Multimodal column operators (SURVEY.md §2.3 — BASELINE.json gap-fill).

Media (image/audio/video) are opaque `binary` columns plus a typed metadata
struct — the 100 TB-scale pattern: bytes flow through Arrow batches, never
through Python row-at-a-time; decode/feature-extract runs per batch in
`mapInPandas`.

Decode support (VERDICT r4 #5, r6 #1; r7 build-out; r9 widening):
- REAL, dependency-free decoders across the triad —
  images: 24/32-bit truecolor + 1/4/8-bit palette BI_RGB BMP, binary
  PNM (P4 bitmap / P5 greymap / P6 pixmap, 1- and 2-byte samples), PNG
  (zlib inflate + numpy unfiltering, all five filters, depths 8/16,
  palette type 3 at depths 1/2/4/8 with tRNS, Adam7 interlace),
  baseline + progressive JPEG (operators/jpeg.py), GIF
  (operators/gif.py, LZW + palettes + interlace), baseline TIFF
  (operators/tiff.py, strips + PackBits), ICO/CUR favicons
  (operators/ico.py);
  audio: WAV (PCM 8/16/24/32, G.711 µ-law/A-law bit-identical to the
  g711.c reference, IEEE float), Sun AU, AIFF (big-endian PCM,
  80-bit-extended rates);
  video: MJPEG-AVI frame sampling (operators/video.py) —
  plus matching encoders for fixture generation and roundtrip tests, and
  a shared dimension/allocation guard against corrupt headers.
- Remaining codec formats (MP3/H.264/WebP/zstd …) stay STUBBED with
  disclosed NotImplementedError: the libs are not in this container;
  ``fake_decoder=True`` substitutes a deterministic content-hash-seeded
  fake so the Spark-side plumbing is still fully exercised.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
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


# -- real uncompressed-format codecs (pure numpy / stdlib) -----------------


def _unpack_indices(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, rowbytes) packed palette indices (MSB-first, depth 1/2/4/8
    bits — the PNG and BMP bit-packing convention) → (h, w) indices."""
    if depth == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    npx = bits.shape[1] // depth
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
    return (bits[:, : npx * depth].reshape(len(rows), npx, depth) * weights).sum(
        axis=2
    )[:, :w]


def _pack_indices(idx: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) palette indices → (h, rowbytes) MSB-first packed bytes."""
    if depth == 8:
        return idx.astype(np.uint8)
    h, w = idx.shape
    per = 8 // depth
    padw = -(-w // per) * per
    ids = np.zeros((h, padw), np.uint8)
    ids[:, :w] = idx
    bits = ((ids[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(h, -1)
    return np.packbits(bits.astype(bool), axis=1)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) BMP → (h, w, 3) uint8 RGB array.

    24/32-bit truecolor plus 1/4/8-bit palette-indexed (color table after
    the info header, BGRA entries) — the palette forms dominate legacy
    web graphics and ICO-embedded bitmaps."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    check_decode_dims(w, h, "BMP")
    if bpp <= 8:  # palette-indexed
        clr_used = struct.unpack_from("<I", payload, 46)[0]
        ncol = clr_used or (1 << bpp)
        tbl = np.frombuffer(
            payload, np.uint8, count=4 * ncol, offset=14 + hdr_size
        ).reshape(ncol, 4)
        table = np.ascontiguousarray(tbl[:, 2::-1])  # BGRA → RGB
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
        idx = _unpack_indices(rows.reshape(h, stride), w, bpp)
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("BMP palette index out of range")
        rgb = table[idx]
    else:
        npx = bpp // 8
        stride = ((w * npx + 3) // 4) * 4
        arr = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
        arr = arr.reshape(h, stride)[:, : w * npx].reshape(h, w, npx)
        rgb = arr[..., 2::-1]  # BGR(A) → RGB, alpha dropped
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp_palette(
    indices: np.ndarray, palette: np.ndarray, bpp: int = 8
) -> bytes:
    """(h, w) uint8 indices + (n ≤ 2^bpp, 3) uint8 RGB palette →
    palette-indexed BI_RGB BMP bytes (bpp 1/4/8), for fixtures/tests."""
    h, w = indices.shape
    assert bpp in (1, 4, 8) and len(palette) <= (1 << bpp)
    assert int(indices.max(initial=0)) < len(palette)
    ncol = 1 << bpp
    tbl = np.zeros((ncol, 4), np.uint8)
    tbl[: len(palette), :3] = np.asarray(palette, np.uint8)[:, ::-1]  # RGB→BGR
    stride = ((w * bpp + 31) // 32) * 4
    rows = np.zeros((h, stride), np.uint8)
    packed = _pack_indices(indices, bpp)
    rows[:, : packed.shape[1]] = packed
    body = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + 4 * ncol
    head = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835, ncol, 0
    )
    return head + info + tbl.tobytes() + body


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up rows)."""
    h, w, _ = px.shape
    pad = (4 - (w * 3) % 4) % 4
    img = px[::-1, :, ::-1].astype(np.uint8)  # bottom-up, RGB → BGR
    body = b"".join(img[i].tobytes() + b"\x00" * pad for i in range(h))
    data_off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + info + body


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PNM family → (h, w, 3) uint8 RGB array.

    P6 pixmap (RGB) and P5 greymap at maxval ≤ 65535 (2-byte big-endian
    samples above 255, rescaled round-half-up to uint8), and P4 bitmap
    (MSB-first packed bits, 1 = black per spec).  Greyscale/bitmap
    broadcast across the three channels like every other 1-channel
    path."""
    magic = payload[:2]
    if magic not in (b"P4", b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    nvals = 2 if magic == b"P4" else 3
    pos, vals = 2, []
    while len(vals) < nvals:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after the last header field
    if magic == b"P4":
        w, h = vals
        check_decode_dims(w, h, "PNM")
        stride = -(-w // 8)
        rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=pos)
        bits = np.unpackbits(rows.reshape(h, stride), axis=1)[:, :w]
        grey = np.where(bits != 0, 0, 255).astype(np.uint8)  # 1 = black
        return np.repeat(grey[:, :, None], 3, axis=2)
    w, h, maxval = vals
    check_decode_dims(w, h, "PNM")
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"invalid PNM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    if maxval > 255:  # 2-byte big-endian samples
        arr = np.frombuffer(payload, ">u2", count=w * h * ch, offset=pos).reshape(
            h, w, ch
        )
    else:
        arr = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=pos).reshape(
            h, w, ch
        )
    if maxval != 255:
        # spec: samples are fractions of maxval — rescale to full-range
        # uint8 (integer round-half-up; a maxval=100 full-intensity pixel
        # must decode as 255, not 100).  Out-of-spec samples > maxval
        # saturate instead of wrapping modulo 256 (corrupt/truncated
        # payloads must stay monotone, not turn mid-gray)
        scaled = (arr.astype(np.uint32) * 255 + maxval // 2) // maxval
        arr = np.minimum(scaled, 255).astype(np.uint8)
    else:
        arr = arr.astype(np.uint8)
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)


#: decode-allocation guard for ALL image decoders (PNG/GIF/JPEG/BMP/PPM):
#: a corrupt or adversarial header can declare multi-gigapixel dims in a
#: few bytes; at corpus scale one such payload would OOM its executor task.
#: 64 Mpx ≈ 8K×8K — far above training-corpus imagery, far below task RAM.
MAX_DECODE_PIXELS = 64 * 1024 * 1024


def check_decode_dims(w: int, h: int, what: str) -> None:
    """Reject non-positive or allocation-bomb dimensions BEFORE any
    pixel-buffer allocation (shared by every image decoder)."""
    if w <= 0 or h <= 0:
        raise ValueError(f"{what}: invalid dimensions {w}x{h}")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{what}: declared {w}x{h} exceeds MAX_DECODE_PIXELS "
            f"({MAX_DECODE_PIXELS}) — corrupt or adversarial header"
        )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type → sample channels (8-bit depth; type 3 = palette is
#: handled separately via the PLTE lookup at depths 1/2/4/8)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a pixel's channel lanes
    (inputs are int32: left, up, upper-left recon bytes)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


#: Adam7 interlace passes: (x0, y0, dx, dy) — pass k covers the pixel
#: lattice out[y0::dy, x0::dx]; each pass filters its scanlines as an
#: independent sub-image
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter_scanlines(
    raw: np.ndarray, nrows: int, units: int, lanes: int, offset: int
) -> tuple[np.ndarray, int]:
    """Consume `nrows` filtered scanlines of (1 + units·lanes) bytes from
    `raw` starting at `offset`; returns ((nrows, units, lanes) int32
    reconstructed samples, new offset)."""
    rowlen = 1 + units * lanes
    end = offset + rowlen * nrows
    if len(raw) < end:
        raise ValueError("PNG pixel data truncated")
    block = raw[offset:end].reshape(nrows, rowlen)
    filters, rows = block[:, 0], block[:, 1:].astype(np.int32)
    out = np.zeros((nrows, units, lanes), np.int32)
    zero_row = np.zeros((units, lanes), np.int32)
    for y in range(nrows):
        f, cur = int(filters[y]), rows[y].reshape(units, lanes)
        prior = out[y - 1] if y else zero_row
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = np.cumsum(cur, axis=0) % 256
        elif f == 2:  # Up
            rec = (cur + prior) % 256
        elif f in (3, 4):  # Average / Paeth: serial in x, lanes vectorized
            rec = np.empty((units, lanes), np.int32)
            left = upleft = zero_row[0]
            for x in range(units):
                up = prior[x]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth(left, up, upleft)
                rec[x] = (cur[x] + pred) % 256
                left, upleft = rec[x], up
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = rec
    return out, end


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8 array.

    Stdlib-only: chunk walk + zlib inflate, then numpy per-row
    unfiltering.  Filters 0 (None) and 2 (Up) are whole-row vectorized;
    1 (Sub) is a per-lane cumulative sum mod 256; 3 (Average) and
    4 (Paeth) scan pixels within the row with vectorized channel lanes
    (the only serial dependency PNG's spec imposes).

    Color types 0/2/4/6 at depth 8 return their native channels; type 3
    (palette, depths 1/2/4/8 — the favicon/legacy-web workhorse) is
    unfiltered at the byte level (the spec's filter unit for sub-byte
    depths), bit-unpacked, and looked up through PLTE; a tRNS chunk
    yields an RGBA result (alpha 255 where unlisted).  Adam7-interlaced
    streams decode pass-by-pass (each pass an independently filtered
    sub-image scattered onto its pixel lattice; empty passes contribute
    no scanlines)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    check_decode_dims(w, h, "PNG")
    if comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG comp={comp} filter={filt}")
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace}")
    if ctype_ == 3:
        if depth not in (1, 2, 4, 8):
            raise NotImplementedError(f"PNG palette depth {depth}")
        if plte is None:
            raise ValueError("PNG palette image missing PLTE")
        lanes = 1
    elif ctype_ in _PNG_CHANNELS:
        if depth not in (8, 16):
            raise NotImplementedError(f"PNG depth={depth} for color type {ctype_}")
        # depth 16: two byte lanes per sample (big-endian); the filter
        # unit is the full 2-byte sample, which per-byte lanes reproduce
        lanes = _PNG_CHANNELS[ctype_] * (depth // 8)
    else:
        raise NotImplementedError(f"PNG color type {ctype_} unsupported")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    if ctype_ == 3:
        canvas = np.zeros((h, w), np.uint8)
    else:
        canvas = np.zeros((h, w, lanes), np.uint8)
    off = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        units = -(-wp * depth // 8) if ctype_ == 3 else wp
        block, off = _unfilter_scanlines(raw, hp, units, lanes, off)
        if ctype_ == 3:
            canvas[y0::dy, x0::dx] = _unpack_indices(
                block[:, :, 0].astype(np.uint8), wp, depth
            )
        else:
            canvas[y0::dy, x0::dx] = block.astype(np.uint8)
    if ctype_ != 3:
        if depth == 16:  # keep the high byte (libpng strip-16 convention)
            return np.ascontiguousarray(canvas[:, :, 0::2])
        return canvas
    pal = np.frombuffer(plte, np.uint8)
    pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
    if len(pal) == 0 or int(canvas.max(initial=0)) >= len(pal):
        raise ValueError("PNG palette index out of range")
    rgb = pal[canvas]
    if trns is None:
        return np.ascontiguousarray(rgb)
    alpha = np.full(len(pal), 255, np.uint8)
    nt = min(len(trns), len(pal))
    alpha[:nt] = np.frombuffer(trns[:nt], np.uint8)
    return np.ascontiguousarray(np.dstack([rgb, alpha[canvas]]))


def _filter_rows(a: np.ndarray, filter_mode: str) -> list[bytes]:
    """(h, units, lanes) int32 samples → filtered PNG scanlines.
    ``"mixed"`` assigns row y filter type y % 5 (exercises every
    unfilter path in one roundtrip); ``"none"`` writes filter 0."""
    h, units, lanes = a.shape
    lines = []
    zero_row = np.zeros((units, lanes), np.int32)
    for y in range(h):
        f = (y % 5) if filter_mode == "mixed" else 0
        cur, prior = a[y], a[y - 1] if y else zero_row
        left = np.vstack([zero_row[:1], cur[:-1]])
        upleft = np.vstack([zero_row[:1], prior[:-1]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - ((left + prior) >> 1)
        else:
            filt = cur - _paeth(left, prior, upleft)
        lines.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
    return lines


def _png_chunk(ctag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctag
        + data
        + struct.pack(">I", zlib.crc32(ctag + data) & 0xFFFFFFFF)
    )


def encode_png(
    px: np.ndarray, filter_mode: str = "mixed", interlace: bool = False
) -> bytes:
    """(h, w[, channels]) uint8 → 8-bit PNG bytes.

    ``filter_mode="mixed"`` assigns row y filter type y % 5, exercising
    every unfilter path in a single roundtrip; ``"none"`` writes filter 0
    throughout.  Channels 1/2/3/4 map to PNG color types 0/4/2/6.
    ``interlace=True`` emits Adam7: each pass's sub-image filtered
    independently, concatenated in pass order."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    a = px.astype(np.int32)
    lines: list[bytes] = []
    for x0, y0, dx, dy in _ADAM7 if interlace else [(0, 0, 1, 1)]:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            lines += _filter_rows(np.ascontiguousarray(sub), filter_mode)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_png16(
    px: np.ndarray, filter_mode: str = "mixed", interlace: bool = False
) -> bytes:
    """(h, w[, channels]) uint16 → 16-bit PNG bytes (big-endian samples),
    for fixtures/tests.  Channels 1/2/3/4 map to color types 0/4/2/6."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    a16 = px.astype(">u2")
    # (h, w, ch) u16 → (h, w, 2·ch) byte lanes, hi byte first
    a = np.frombuffer(a16.tobytes(), np.uint8).reshape(h, w, ch * 2).astype(np.int32)
    lines: list[bytes] = []
    for x0, y0, dx, dy in _ADAM7 if interlace else [(0, 0, 1, 1)]:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            lines += _filter_rows(np.ascontiguousarray(sub), filter_mode)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 1 if interlace else 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: bytes | None = None,
    depth: int = 8,
    filter_mode: str = "mixed",
    interlace: bool = False,
) -> bytes:
    """(h, w) uint8 indices + (n ≤ 2^depth, 3) uint8 RGB palette →
    color-type-3 PNG (depth 1/2/4/8, optional tRNS alpha bytes, optional
    Adam7), for fixtures/tests.  Sub-byte depths pack MSB-first per
    scanline and filter at the byte level, matching the spec's filter
    unit (each Adam7 pass packs its own rows)."""
    h, w = indices.shape
    assert depth in (1, 2, 4, 8) and len(palette) <= (1 << depth)
    assert int(indices.max(initial=0)) < len(palette)
    lines: list[bytes] = []
    for x0, y0, dx, dy in _ADAM7 if interlace else [(0, 0, 1, 1)]:
        sub = indices[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            rows = _pack_indices(np.ascontiguousarray(sub), depth)
            lines += _filter_rows(rows.astype(np.int32)[:, :, None], filter_mode)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1 if interlace else 0)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    out += _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
    return out + _png_chunk(b"IEND", b"")


def png_to_rgb(px: np.ndarray) -> np.ndarray:
    """Native-channel PNG decode → (h, w, 3) RGB: grey broadcasts across
    channels, alpha is dropped (matching the BMP 32-bit path)."""
    ch = px.shape[2]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # grey + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def _ulaw_to_linear(b: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16-range linears (audioop.ulaw2lin math)."""
    u = (~b.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag)


def _alaw_to_linear(b: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16-range linears (audioop.alaw2lin math;
    note A-law's sign bit is 1 for POSITIVE, opposite of µ-law)."""
    a = b.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(sign != 0, mag, -mag)


_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def _linear_to_ulaw(s: np.ndarray) -> np.ndarray:
    """int16-range linears → G.711 µ-law bytes — the exact reference
    algorithm (Sun g711.c, as vendored by CPython's audioop): 14-bit
    pre-shift, bias 33, table segment search.  Bit-identical to
    audioop.lin2ulaw over the full int16 range (pinned in tests)."""
    pcm = s.astype(np.int64) >> 2
    mask = np.where(pcm < 0, 0x7F, 0xFF)
    pcm = np.minimum(np.abs(pcm), 8159) + 33
    seg = np.searchsorted(_SEG_UEND, pcm, side="left")
    uval = np.where(
        seg >= 8, 0x7F, (seg << 4) | ((pcm >> np.minimum(seg + 1, 8)) & 0x0F)
    )
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def _linear_to_alaw(s: np.ndarray) -> np.ndarray:
    """int16-range linears → G.711 A-law bytes (same provenance as
    _linear_to_ulaw; 13-bit pre-shift, seg<2 special case)."""
    pcm = s.astype(np.int64) >> 3
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    pcm = np.where(pcm < 0, -pcm - 1, pcm)
    seg = np.searchsorted(_SEG_AEND, pcm, side="left")
    mant = np.where(seg < 2, (pcm >> 1) & 0x0F, (pcm >> np.minimum(seg, 7)) & 0x0F)
    aval = np.where(seg >= 8, 0x7F, (seg << 4) | mant)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def _parse_wav_chunks(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Minimal RIFF walk → (format_tag, n_channels, sample_rate,
    bits_per_sample, data bytes) — used for the non-PCM encodings the
    stdlib ``wave`` module rejects (µ-law/A-law/IEEE float)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, nch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag in GUID
                tag = struct.unpack_from("<H", body, 24)[0]
            fmt = (tag, nch, sr, bits)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return (*fmt, data)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV → (sample_rate, n_channels, mono float64 samples in [−1, 1]);
    multi-channel audio is downmixed by channel mean.

    Encodings: integer PCM 8/16/32-bit (stdlib ``wave``), IEEE float
    32/64-bit, and G.711 µ-law / A-law (r7 — the telephony-corpus
    encodings; vectorized expansion tables, audioop-compatible math)."""
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sr, nch, sw = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
        if sw == 2:
            x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
        elif sw == 1:  # WAV 8-bit is unsigned
            x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif sw == 3:  # 24-bit little-endian signed (the studio format)
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v >= (1 << 23)) * (1 << 24)  # sign-extend
            x = v.astype(np.float64) / 8388608.0
        elif sw == 4:
            x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"WAV sample width {sw}")
    except wave.Error:
        # non-PCM encodings the stdlib rejects: walk the RIFF ourselves
        tag, nch, sr, bits, data = _parse_wav_chunks(payload)
        if tag == 3 and bits == 32:  # IEEE float
            x = np.frombuffer(data, "<f4").astype(np.float64)
        elif tag == 3 and bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float64)
        elif tag == 7:  # µ-law
            x = _ulaw_to_linear(np.frombuffer(data, np.uint8)) / 32768.0
        elif tag == 6:  # A-law
            x = _alaw_to_linear(np.frombuffer(data, np.uint8)) / 32768.0
        else:
            raise NotImplementedError(f"WAV format tag {tag} bits {bits}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, nch, x


AU_MAGIC = b".snd"


def decode_au(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Sun AU (.snd) → (sample_rate, n_channels, mono float64 in [−1, 1]).

    The classic speech-corpus container: header is six u32be fields;
    encodings 1 (G.711 µ-law), 2 (signed PCM8), 3 (PCM16 BE),
    6 (float32 BE) decode; others raise."""
    if payload[:4] != AU_MAGIC:
        raise ValueError("not a Sun AU payload")
    off, size, enc, sr, nch = struct.unpack_from(">IIIII", payload, 4)
    data = payload[off : off + size] if size != 0xFFFFFFFF else payload[off:]
    if enc == 1:
        x = _ulaw_to_linear(np.frombuffer(data, np.uint8)) / 32768.0
    elif enc == 2:  # AU PCM8 is SIGNED (unlike WAV)
        x = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        x = np.frombuffer(data, ">i2").astype(np.float64) / 32768.0
    elif enc == 6:
        x = np.frombuffer(data, ">f4").astype(np.float64)
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, nch, x


def encode_au(x: np.ndarray, sample_rate: int, encoding: str = "ulaw") -> bytes:
    """Mono float64 samples → Sun AU bytes (µ-law or PCM16-BE)."""
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int64)
    if encoding == "ulaw":
        enc, body = 1, _linear_to_ulaw(pcm).tobytes()
    elif encoding == "pcm16":
        enc, body = 3, pcm.astype(">i2").tobytes()
    else:
        raise ValueError(f"unknown AU encoding {encoding!r}")
    head = AU_MAGIC + struct.pack(">IIIII", 24, len(body), enc, sample_rate, 1)
    return head + body


def _f80_to_float(b: bytes) -> float:
    """80-bit IEEE extended (AIFF sampleRate field) → float."""
    (se,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:10], "big")
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _float_to_f80(v: float) -> bytes:
    """float → 80-bit IEEE extended bytes (normalized; v > 0)."""
    import math

    if v == 0:
        return b"\x00" * 10
    exp = math.floor(math.log2(v))
    mant = int(v / 2.0**exp * (1 << 63))
    if mant >= 1 << 64:  # rounding pushed the mantissa over
        mant >>= 1
        exp += 1
    return struct.pack(">H", exp + 16383) + mant.to_bytes(8, "big")


def decode_aiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """AIFF / AIFF-C (FORM container) → (sample_rate, n_channels, mono
    float64 in [−1, 1]).

    AIFF: 8/16/32-bit big-endian PCM.  AIFF-C (r9) compression types:
    'NONE' (big-endian PCM — verbatim AIFF semantics), 'sowt' (the Mac
    byte-swapped little-endian 16-bit PCM), 'fl32'/'FL32' and
    'fl64'/'FL64' (big-endian IEEE float).  Codec compressions (ima4,
    µ-law tags etc.) raise NotImplementedError."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos = 12
    comm = ssnd = None
    comp = b"NONE"
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"COMM":
            nch, _nframes, bits = struct.unpack_from(">HIH", body, 0)
            sr = int(round(_f80_to_float(body[8:18])))
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
            comm = (nch, bits, sr)
        elif cid == b"SSND":
            (off2, _blk) = struct.unpack_from(">II", body, 0)
            ssnd = body[8 + off2 :]
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    nch, bits, sr = comm
    if comp == b"sowt":  # little-endian 16-bit PCM
        if bits != 16:
            raise NotImplementedError(f"AIFC sowt with {bits}-bit samples")
        x = np.frombuffer(ssnd, "<i2").astype(np.float64) / 32768.0
    elif comp in (b"fl32", b"FL32"):
        x = np.frombuffer(ssnd, ">f4").astype(np.float64)
    elif comp in (b"fl64", b"FL64"):
        x = np.frombuffer(ssnd, ">f8").astype(np.float64)
    elif comp != b"NONE":
        raise NotImplementedError(
            f"AIFC compression {comp!r} (NONE/sowt/fl32/fl64 decode natively)"
        )
    elif bits == 16:
        x = np.frombuffer(ssnd, ">i2").astype(np.float64) / 32768.0
    elif bits == 8:  # AIFF 8-bit is signed
        x = np.frombuffer(ssnd, np.int8).astype(np.float64) / 128.0
    elif bits == 32:
        x = np.frombuffer(ssnd, ">i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"AIFF {bits}-bit samples")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return sr, nch, x


def encode_aiff_pcm16(x: np.ndarray, sample_rate: int) -> bytes:
    """Mono float64 samples → 16-bit AIFF bytes."""
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(">i2")
    body = pcm.tobytes()
    comm = struct.pack(">HIH", 1, len(pcm), 16) + _float_to_f80(float(sample_rate))
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def encode_wav_g711(x: np.ndarray, sample_rate: int, law: str = "ulaw") -> bytes:
    """Mono float64 samples in [−1, 1] → G.711 µ-law/A-law WAV bytes
    (format tag 7/6) — the telephony-corpus fixture counterpart of
    decode_wav's non-PCM path."""
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int64)
    if law == "ulaw":
        tag, body = 7, _linear_to_ulaw(pcm).tobytes()
    elif law == "alaw":
        tag, body = 6, _linear_to_alaw(pcm).tobytes()
    else:
        raise ValueError(f"unknown companding law {law!r}")
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_wav_float32(x: np.ndarray, sample_rate: int) -> bytes:
    """Mono float64 samples → IEEE-float32 WAV bytes (format tag 3)."""
    body = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sample_rate, sample_rate * 4, 4, 32)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_wav_pcm16(x: np.ndarray, sample_rate: int) -> bytes:
    """Mono float64 samples in [−1, 1] → 16-bit PCM WAV bytes.

    Same full-scale convention as decode_wav (±32768, +1.0 clips to
    32767), so a roundtrip is exact to half a quantization step."""
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resize_nearest(px: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize — pure-numpy index gather, no interpolation
    libs; identity when dims already match."""
    sh, sw = px.shape[:2]
    if (sh, sw) == (h, w):
        return px
    return px[np.arange(h) * sh // h][:, np.arange(w) * sw // w]


def _decode_pixels(
    payload: bytes, height: int, width: int, fake_decoder: bool
) -> np.ndarray:
    """Dispatch on magic bytes: real decoders for the uncompressed formats,
    deterministic fake (opt-in) for everything else.  With fake_decoder, a
    payload that merely STARTS like BMP/PPM but fails to parse (e.g. text
    bytes beginning "BM") falls through to the fake instead of failing —
    magic bytes are a heuristic, not a guarantee."""
    from wukong_spark.operators.gif import GIF_MAGICS, decode_gif
    from wukong_spark.operators.ico import decode_ico, is_ico
    from wukong_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg
    from wukong_spark.operators.tiff import TIFF_MAGICS, decode_tiff, tiff_to_rgb

    if (
        payload[:2] in (b"BM", b"P4", b"P5", b"P6")
        or payload[:8] == PNG_MAGIC
        or payload[:2] == JPEG_MAGIC
        or payload[:6] in GIF_MAGICS
        or payload[:4] in TIFF_MAGICS
        or is_ico(payload)
    ):
        try:
            if payload[:8] == PNG_MAGIC:
                px = png_to_rgb(decode_png(payload))
            elif payload[:2] == JPEG_MAGIC:
                px = decode_jpeg(payload)
            elif payload[:6] in GIF_MAGICS:
                px = decode_gif(payload)
            elif payload[:4] in TIFF_MAGICS:
                px = tiff_to_rgb(decode_tiff(payload))
            elif payload[:2] == b"BM":
                px = decode_bmp(payload)
            elif payload[:2] in (b"P4", b"P5", b"P6"):
                px = decode_ppm(payload)
            else:
                px = decode_ico(payload)
            return resize_nearest(px, height, width)
        except Exception:
            if not fake_decoder:
                raise
    if fake_decoder:
        return _fake_pixels(payload, height, width)
    raise NotImplementedError(
        "payload is not a BMP / PNM / PNG / JPEG / GIF / baseline TIFF "
        "/ ICO (the formats decoded natively); codec libraries for other "
        "compressed formats are not available in this environment — pass "
        "fake_decoder=True to exercise the pipeline with a deterministic "
        "content-seeded decoder"
    )


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    height: int = 32,
    width: int = 32,
    fake_decoder: bool = False,
) -> DataFrame:
    """binary → fixed-size RGB tensor + channel statistics, Arrow-batched.

    BMP / P6 PPM / 8-bit PNG / baseline JPEG / GIF / baseline TIFF / ICO payloads decode NATIVELY
    (magic-byte dispatch, pure numpy + stdlib) and are nearest-neighbor-resized to
    (height, width); other formats require ``fake_decoder=True`` (codec
    libs absent — see module docstring).  Plumbing (batch shape, schema,
    partition-parallelism) is identical for a PIL/libvips decoder.
    """
    out_schema = (
        "media_id long, height int, width int, pixels array<int>, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                px = _decode_pixels(bytes(payload), height, width, fake_decoder)
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


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    fake_decoder: bool = False,
) -> DataFrame:
    """binary → per-clip audio features, Arrow-batched.

    WAV (PCM / G.711 / IEEE float), Sun AU (µ-law / signed PCM / float —
    the classic speech-corpus container), and AIFF (big-endian PCM)
    payloads decode NATIVELY (stdlib + numpy, downmixed to mono); other
    formats require ``fake_decoder=True``."""
    out_schema = (
        "media_id long, sample_rate int, n_channels int, n_samples long, "
        "duration_s double, rms double, peak double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                decoded = None
                if (
                    (b[:4] == b"RIFF" and b[8:12] == b"WAVE")
                    or b[:4] == AU_MAGIC
                    or (b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"))
                ):
                    try:
                        if b[:4] == AU_MAGIC:
                            decoded = decode_au(b)
                        elif b[:4] == b"FORM":
                            decoded = decode_aiff(b)
                        else:
                            decoded = decode_wav(b)
                    except Exception:
                        if not fake_decoder:
                            raise
                if decoded is not None:
                    sr, nch, x = decoded
                elif fake_decoder:
                    seed = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
                    sr, nch = 16000, 1
                    x = np.random.default_rng(seed).uniform(-1, 1, 1600)
                else:
                    raise NotImplementedError(
                        "payload is not WAV / Sun AU / AIFF (the formats "
                        "decoded natively); audio codec libraries are not "
                        "available — pass fake_decoder=True"
                    )
                n = len(x)
                rows.append(
                    (
                        int(mid),
                        int(sr),
                        int(nch),
                        n,
                        n / sr if sr else 0.0,
                        float(np.sqrt(np.mean(x**2))) if n else 0.0,
                        float(np.abs(x).max()) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak",
                ],
            )

    return df.select("media_id", payload_col).mapInPandas(run, out_schema)


def _sample_video_frames(b: bytes, n_frames: int):
    """AVI or animated-GIF bytes → [(frame_no, (h, w, 3) pixels)] for n
    evenly-spaced frames, or None when the container is unrecognized.
    Shared by frame_sample and fingerprint_video_frames."""
    from wukong_spark.operators.gif import GIF_MAGICS, sample_gif_frames
    from wukong_spark.operators.video import count_frames, extract_frames, is_avi

    if is_avi(b):
        total = count_frames(b)
        k = min(n_frames, total)
        picks = sorted({(i * (total - 1)) // max(k - 1, 1) for i in range(k)})
        return extract_frames(b, picks)
    if b[:6] in GIF_MAGICS:
        return sample_gif_frames(b, n_frames)
    return None


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    fake_decoder: bool = False,
) -> DataFrame:
    """Video/animation → n evenly-spaced sampled frames, one row each.

    MJPEG AVI payloads decode for REAL (r7 — operators/video.py container
    walk + the baseline JPEG decoder), and animated GIFs (r9 —
    operators/gif.py full compositing: partial rectangles, transparency,
    disposal) flow through the SAME operator; each sampled frame emits
    its source frame number plus exact integer channel sums (the
    oracle-able contract the image decoders use).  Other containers/
    codecs require ``fake_decoder=True`` (codec libs absent), which
    emits deterministic content-seeded fakes through the identical
    schema."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "frame_idx", "frame_no",
            "frame_mean", "sum_r", "sum_g", "sum_b",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                try:
                    decoded = _sample_video_frames(b, n_frames)
                except Exception:
                    if not fake_decoder:
                        raise
                    decoded = None
                if decoded is not None:
                    for idx, (fn, px) in enumerate(decoded):
                        s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                        rows.append(
                            (int(mid), idx, int(fn), float(px.mean()),
                             int(s[0]), int(s[1]), int(s[2]))
                        )
                elif fake_decoder:
                    for k in range(n_frames):
                        px = _fake_pixels(b + bytes([k]), 8, 8)
                        s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                        rows.append(
                            (int(mid), k, k, float(px.mean()),
                             int(s[0]), int(s[1]), int(s[2]))
                        )
                else:
                    raise NotImplementedError(
                        "payload is not an MJPEG AVI or animated GIF (the "
                        "containers decoded natively); other video codecs "
                        "need real codec libraries — pass fake_decoder=True"
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", payload_col).mapInPandas(
        run,
        "media_id long, frame_idx int, frame_no int, frame_mean double,"
        " sum_r long, sum_g long, sum_b long",
    )


def image_dhash(px: np.ndarray) -> int:
    """(h, w, 3) uint8 RGB → 64-bit difference hash (dHash).

    Integer-exact pipeline: BT.601 luma in fixed point
    ((299·R + 587·G + 114·B) // 1000), nearest-neighbor resize to 9×8,
    then one bit per horizontal gradient sign (row-major).  Small
    content changes flip few bits, so near-duplicate images sit at low
    Hamming distance — the perceptual complement of text SimHash."""
    lum = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    ) // 1000
    g = resize_nearest(lum[:, :, None].astype(np.uint8), 8, 9)[:, :, 0]
    bits = (g[:, 1:].astype(np.int64) > g[:, :-1]).ravel()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


def dhash_images(
    df: DataFrame, payload_col: str = "payload", fake_decoder: bool = False
) -> DataFrame:
    """binary image column → (media_id, dhash, 4×16-bit bands).

    Arrow-batched map-only decode+hash; the band columns are the LSH
    handles — near-duplicates (Hamming ≤ k on 64 bits) must agree on at
    least one of the 4 bands whenever k ≤ 3 (pigeonhole: 4 bands, k
    flips damage at most k of them).  Recall above distance 3 through
    these 4 bands alone is probabilistic; for a structural gate at
    higher distances derive composite keys from `dhash` instead — e.g.
    the 28 block-pair keys dedup_image_dhash builds (any 2 of 8 byte
    blocks clean → guaranteed recall at Hamming ≤ 6, Manku et al.
    WWW'07).  Either way candidates come from equi-joins, never
    all-pairs — the image-side twin of the SimHash banding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "dhash", "b0", "b1", "b2", "b3"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                px = _decode_pixels(bytes(payload), 64, 64, fake_decoder)
                h = image_dhash(px)
                signed = h - (1 << 64) if h >= (1 << 63) else h
                rows.append(
                    (
                        int(mid), signed,
                        (h >> 48) & 0xFFFF, (h >> 32) & 0xFFFF,
                        (h >> 16) & 0xFFFF, h & 0xFFFF,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", payload_col).mapInPandas(
        run,
        "media_id long, dhash long, b0 int, b1 int, b2 int, b3 int",
    )


def audio_fingerprint(
    x: np.ndarray, n_fft: int = 1024, hop: int = 512
) -> np.ndarray:
    """Mono float samples → per-frame dominant-frequency bins (int32).

    Hann-windowed STFT magnitude, argmax over bins 1..n_fft/2 (DC
    excluded) — the shape of a spectral-peak audio fingerprint
    (Shazam-style constellations reduce to sequences of peak bins).
    Deterministic: numpy's rfft is fixed IEEE arithmetic, and fixtures
    use BIN-CENTERED tones so the argmax margin is orders of magnitude
    above any platform drift."""
    n = (len(x) - n_fft) // hop + 1 if len(x) >= n_fft else 0
    if n <= 0:
        return np.zeros(0, np.int32)
    win = np.hanning(n_fft)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop][:n]
    mag = np.abs(np.fft.rfft(frames * win, axis=1))
    return (mag[:, 1:].argmax(axis=1) + 1).astype(np.int32)


def fingerprint_audio(
    df: DataFrame, payload_col: str = "payload", n_fft: int = 1024, hop: int = 512
) -> DataFrame:
    """binary audio column → one row per STFT frame with its dominant
    bin — Arrow-batched map-only (the audio-side feature-extract twin of
    dhash_images; at corpus scale fingerprint rows shuffle for matching,
    never the waveforms)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_no", "peak_bin", "sample_rate"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] == b"RIFF":
                    sr, _nch, x = decode_wav(b)
                elif b[:4] == b".snd":
                    sr, _nch, x = decode_au(b)
                elif b[:4] == b"FORM":
                    sr, _nch, x = decode_aiff(b)
                else:
                    raise ValueError("unsupported audio container")
                for fn, bin_ in enumerate(audio_fingerprint(x, n_fft, hop)):
                    rows.append((int(mid), fn, int(bin_), sr))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", payload_col).mapInPandas(
        run, "media_id long, frame_no int, peak_bin int, sample_rate int"
    )


def fingerprint_video_frames(
    df: DataFrame, payload_col: str = "payload", n_frames: int = 4
) -> DataFrame:
    """binary video/animation column → one row per sampled frame with
    its 64-bit dHash — video near-duplicate detection reduces to
    matching shared frame hashes, so clips shuffle 8-byte fingerprints,
    never pixels (the video leg of the perceptual-fingerprint triad)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "frame_no", "dhash"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                decoded = _sample_video_frames(bytes(payload), n_frames)
                if decoded is None:
                    raise NotImplementedError(
                        "payload is not an MJPEG AVI or animated GIF"
                    )
                for idx, (fn, px) in enumerate(decoded):
                    h = image_dhash(resize_nearest(px, 64, 64))
                    signed = h - (1 << 64) if h >= (1 << 63) else h
                    rows.append((int(mid), idx, int(fn), signed))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", payload_col).mapInPandas(
        run, "media_id long, frame_idx int, frame_no int, dhash long"
    )


def augment_images(
    decoded: DataFrame, epoch: int, crop_margin: int = 2, seed: int = 17
) -> DataFrame:
    """DETERMINISTIC per-(sample, epoch) image augmentation (r11) — the
    training-loader transform that must be REPRODUCIBLE: a horizontal
    flip coin and a random-crop offset drawn from
    `default_rng((seed, media_id, epoch))`, so the same sample in the
    same epoch augments identically on any executor, any partitioning,
    any retry — and differently across epochs.  (A per-task RNG stream
    would re-roll under recompute: the SPARK-23207 rule applied to
    augmentation.)

    Input: decode_images output (media_id, height, width, pixels
    interleaved-RGB).  Output: same shape with height/width reduced by
    `crop_margin` and the augmented pixel array.

    100 TB path: map-only Arrow pass, one numpy view-flip + slice per
    sample — no shuffle, no Python per pixel."""
    from typing import Iterator as _Iterator

    out_schema = "media_id long, height int, width int, pixels array<int>"

    def run(batches: _Iterator[pd.DataFrame]) -> _Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, h, w, px in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["pixels"]
            ):
                h, w = int(h), int(w)
                rng = np.random.default_rng((seed, int(mid), epoch))
                a = np.asarray(px, dtype=np.int32).reshape(h, w, 3)
                if int(rng.integers(0, 2)):
                    a = a[:, ::-1]
                oy = int(rng.integers(0, crop_margin + 1))
                ox = int(rng.integers(0, crop_margin + 1))
                nh, nw = h - crop_margin, w - crop_margin
                a = a[oy : oy + nh, ox : ox + nw]
                rows.append((int(mid), nh, nw, a.ravel().tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "pixels"]
            )

    return decoded.select("media_id", "height", "width", "pixels").mapInPandas(
        run, out_schema
    )
