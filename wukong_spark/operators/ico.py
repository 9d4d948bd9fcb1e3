"""ICO (Windows icon) decoder — dependency-free, composes bmp/png.

Web crawls carry favicons; an ICO file is a tiny directory over images
that are either PNG payloads (modern) or BMPs stored WITHOUT the 14-byte
file header and with DOUBLED height (the XOR color plane stacked over an
AND transparency mask).  This decoder walks the directory, picks the
largest entry, and routes it through the existing PNG / BMP machinery —
no new pixel code, just the container logic (the AND mask is ignored;
pixels keep their colors, matching the alpha-drop convention elsewhere).

Entries decode through either path: PNG payloads (incl. palette PNGs),
24/32-bit truecolor BMPs, and 1/4/8-bit palette-indexed BMPs (the color
table rides along into the rebuilt standalone BMP).  CUR files (cursor
hotspots) share the layout and decode the same way.
"""

from __future__ import annotations

import struct

import numpy as np

from wukong_spark.operators.multimodal import (
    PNG_MAGIC,
    check_decode_dims,
    decode_bmp,
    decode_png,
    png_to_rgb,
)


def is_ico(payload: bytes) -> bool:
    """ICO/CUR magic: reserved=0, type 1 (icon) or 2 (cursor), count ≥ 1."""
    if len(payload) < 6:
        return False
    res, typ, cnt = struct.unpack_from("<HHH", payload, 0)
    return res == 0 and typ in (1, 2) and 1 <= cnt <= 1024


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO/CUR bytes → (h, w, 3) uint8 RGB of the LARGEST directory entry."""
    if not is_ico(payload):
        raise ValueError("not an ICO/CUR payload")
    (_, _, count) = struct.unpack_from("<HHH", payload, 0)
    best = None  # (area, offset, size)
    for k in range(count):
        e = 6 + 16 * k
        w, h = payload[e], payload[e + 1]
        w, h = w or 256, h or 256  # 0 encodes 256
        size, off = struct.unpack_from("<II", payload, e + 8)
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    _, off, size = best
    body = payload[off : off + size]
    if body[:8] == PNG_MAGIC:
        return png_to_rgb(decode_png(body))
    # BMP entry: BITMAPINFOHEADER with doubled height, no file header.
    # Rebuild a standalone BMP: prepend the 14-byte header and halve the
    # height field (drop the AND mask rows, which sit ABOVE the color
    # rows in the bottom-up layout — truncating the data is enough).
    if len(body) < 40:
        raise ValueError("ICO entry truncated")
    hdr_size, w, h2 = struct.unpack_from("<Iii", body, 0)
    if hdr_size < 40:
        raise NotImplementedError("ICO BITMAPCOREHEADER entry")
    bpp = struct.unpack_from("<H", body, 14)[0]
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"ICO BMP entry bpp={bpp}")
    h = abs(h2) // 2
    check_decode_dims(w, h, "ICO")
    fixed = bytearray(body)
    struct.pack_into("<i", fixed, 8, h if h2 > 0 else -h)
    # color table follows the header at EVERY depth: mandatory for
    # palette entries, optional (biClrUsed > 0) for 24/32-bit ones
    # (ADVICE r9 — skipping it shifted the data offset onto the table)
    clr_used = struct.unpack_from("<I", body, 32)[0]
    ncol = (clr_used or (1 << bpp)) if bpp <= 8 else clr_used
    table_bytes = 4 * ncol
    data_off = 14 + hdr_size + table_bytes
    head = struct.pack("<2sIHHI", b"BM", data_off + len(fixed), 0, 0, data_off)
    # keep only header + color table + the color-plane rows (truncating
    # drops the AND-mask rows that sit above them in the bottom-up layout)
    stride = ((w * bpp + 31) // 32) * 4
    color_end = hdr_size + table_bytes + stride * h
    return decode_bmp(bytes(head) + bytes(fixed[:color_end]))


def encode_ico(images: list[np.ndarray], as_png: bool = True) -> bytes:
    """List of (h, w, 3) uint8 RGB images → ICO bytes (PNG or BMP-entry
    encoding) for fixtures and roundtrip tests."""
    from wukong_spark.operators.multimodal import encode_bmp, encode_png

    bodies = []
    for px in images:
        if as_png:
            bodies.append(encode_png(px, filter_mode="none"))
        else:
            # BMP entry: strip the 14-byte file header, double the height
            b = bytearray(encode_bmp(px)[14:])
            h = px.shape[0]
            struct.pack_into("<i", b, 8, 2 * h)
            bodies.append(bytes(b))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    off = 6 + 16 * len(images)
    for px, body in zip(images, bodies):
        h, w = px.shape[:2]
        out += struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0,
            h if h < 256 else 0,
            0, 0, 1, 32 if not as_png else 0, len(body), off,
        )
        off += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def encode_ico_palette(entries: list[tuple[np.ndarray, np.ndarray, int]]) -> bytes:
    """[(indices (h, w) uint8, palette (n, 3) uint8, bpp), ...] → ICO
    bytes with palette-indexed BMP entries (fixture/test helper)."""
    from wukong_spark.operators.multimodal import encode_bmp_palette

    bodies, dims = [], []
    for idx, pal, bpp in entries:
        b = bytearray(encode_bmp_palette(idx, pal, bpp)[14:])
        struct.pack_into("<i", b, 8, 2 * idx.shape[0])  # doubled height
        bodies.append(bytes(b))
        dims.append(idx.shape)
    out = bytearray(struct.pack("<HHH", 0, 1, len(bodies)))
    off = 6 + 16 * len(bodies)
    for (h, w), body in zip(dims, bodies):
        out += struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0,
            h if h < 256 else 0,
            0, 0, 1, 0, len(body), off,
        )
        off += len(body)
    for body in bodies:
        out += body
    return bytes(out)
