"""GIF codec — dependency-free (numpy + stdlib).

Completes the image-format family for the multimodal decode path (BMP /
PPM / PNG / JPEG already native): a real GIF87a/89a decoder — logical
screen + image descriptors, global/local color tables, LZW decompression
(variable 3–12-bit codes, LSB-first packing, clear/EOI handling including
the KwKwK case), 4-pass interlace — plus a matching encoder (real LZW
compression with clear-on-full-table) for fixture generation and
roundtrip tests.  GIF is lossless over its palette, so roundtrips are
exact, unlike JPEG.

`decode_gif` returns the FIRST image frame (still-image semantics;
transparency indexes keep their palette color).  `extract_gif_frames`
(r9) implements full GIF89a animation semantics — per-frame rectangles
composited at (left, top), Graphic Control transparency, disposal
none/keep/restore-background/restore-previous — returning fully
composited canvases; `sample_gif_frames` takes n evenly-spaced frames
with memory bounded by the SAMPLE size (structural frame count, one
compositing pass, early exit after the last pick); `encode_gif_animation`
writes multi-frame fixtures (GCE + NETSCAPE loop block) for roundtrip
tests.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_width(next_code: int, min_code_size: int) -> int:
    """Code width both sides agree on: wide enough for the decoder's next
    assignable index (receivable via the KwKwK case), floored at
    min_code_size+1, capped at 12."""
    return max(min_code_size + 1, next_code.bit_length()) if next_code >= (
        1 << (min_code_size + 1)
    ) else min_code_size + 1


class _LSBWriter:
    """LSB-first bit packer (GIF's bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _LSBReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over a palette-index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LSBWriter()

    def reset():
        return {}, eoi + 1

    table, next_code = reset()
    bw.write(clear, _lzw_width(next_code, min_code_size))
    it = iter(int(x) for x in indices)
    try:
        cur = next(it)
    except StopIteration:
        bw.write(eoi, _lzw_width(next_code, min_code_size))
        return bw.flush()
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        # width must cover the decoder's next assignable (== our last
        # assigned), i.e. next_code - 1
        bw.write(cur, _lzw_width(next_code - 1, min_code_size))
        table[(cur, k)] = next_code
        next_code += 1
        cur = k
        if next_code == 4096:
            bw.write(clear, _lzw_width(next_code - 1, min_code_size))
            table, next_code = reset()
    bw.write(cur, _lzw_width(next_code - 1, min_code_size))
    bw.write(eoi, _lzw_width(next_code, min_code_size))
    return bw.flush()


def lzw_decompress(data: bytes, min_code_size: int, n_out: int) -> np.ndarray:
    """Inverse of lzw_compress; stops after n_out indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LSBReader(data)
    out = np.empty(n_out, np.uint8)
    npix = 0
    table: list[bytes] = []
    prev: bytes | None = None
    next_code = eoi + 1

    def reset_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    while npix < n_out:
        width = min(12, _lzw_width(next_code, min_code_size))
        code = rd.read(width)
        if code == clear:
            table = reset_table()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("GIF LZW data before first clear code")
        if prev is None:
            entry = table[code]
        elif code < len(table) and code != eoi:
            entry = table[code]
            # deferred-clear interop: encoders stop assigning at 4096 and
            # keep emitting from the frozen table; the decoder must freeze
            # its table too or the code/width lockstep drifts
            if next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
        elif code == next_code and next_code < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        take = min(len(entry), n_out - npix)
        out[npix : npix + take] = np.frombuffer(entry[:take], np.uint8)
        npix += take
        prev = entry
    if npix < n_out:
        raise ValueError("GIF pixel data truncated")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_screen(payload: bytes):
    """Header + logical screen → (sw, sh, gct, bg_index, pos)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    return sw, sh, gct, bg, pos


def _parse_image_block(payload: bytes, pos: int, gct):
    """pos AT the byte after 0x2C → (left, top, index rows, color table,
    new pos).  Shared by the first-frame and animation walks."""
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    from wukong_spark.operators.multimodal import check_decode_dims

    check_decode_dims(w, h, "GIF")
    ct = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if ct is None:
        raise ValueError("GIF image has no color table")
    mcs = payload[pos]
    pos += 1
    chunks = []
    while payload[pos]:
        ln = payload[pos]
        chunks.append(payload[pos + 1 : pos + 1 + ln])
        pos += 1 + ln
    pos += 1
    idx = lzw_decompress(b"".join(chunks), mcs, w * h)
    if idx.max(initial=0) >= len(ct):
        raise ValueError("GIF palette index out of range")
    rows = idx.reshape(h, w)
    if ipacked & 0x40:  # 4-pass interlace: reorder rows
        de = np.empty_like(rows)
        src = 0
        for start, step in _INTERLACE_PASSES:
            for y in range(start, h, step):
                de[y] = rows[src]
                src += 1
        rows = de
    return left, top, rows, ct, pos


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the first image frame."""
    _sw, _sh, gct, _bg, pos = _parse_screen(payload)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _left, _top, rows, ct, pos = _parse_image_block(payload, pos, gct)
        return np.ascontiguousarray(ct[rows])
    raise ValueError("GIF missing image descriptor")


def count_gif_frames(payload: bytes) -> int:
    """Number of image blocks — a STRUCTURAL walk (descriptors + data
    sub-block lengths only, no LZW decode), cheap enough to run before
    deciding which frames to decode."""
    _sw, _sh, gct, _bg, pos = _parse_screen(payload)
    n = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ipacked = payload[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += (2 << (ipacked & 0x07)) * 3
        pos += 1  # min code size
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
        n += 1
    return n


def _walk_composited_frames(payload: bytes):
    """Generator of (frame_idx, canvas) with GIF89a animation semantics:
    per-frame rectangles composite at (left, top); a Graphic Control
    Extension's transparency index leaves underlying canvas pixels
    visible; disposal 0/1 leaves the canvas, 2 restores the frame
    rectangle to the background color, 3 restores the pre-frame canvas.

    The yielded canvas is the walker's own mutable buffer — callers that
    retain a frame must copy it."""
    from wukong_spark.operators.multimodal import check_decode_dims

    sw, sh, gct, bg, pos = _parse_screen(payload)
    check_decode_dims(sw, sh, "GIF")
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    fidx = 0
    gce = None  # (disposal, transparent_idx or None)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # Graphic Control
                packed = payload[pos + 1]
                tidx = payload[pos + 4] if packed & 1 else None
                gce = ((packed >> 2) & 7, tidx)
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, rows, ct, pos = _parse_image_block(payload, pos, gct)
        h, w = rows.shape
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rectangle outside logical screen")
        disposal, tidx = gce if gce is not None else (0, None)
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        px = ct[rows]
        if tidx is not None:
            mask = rows != tidx
            region[mask] = px[mask]
        else:
            region[:] = px
        yield fidx, canvas
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas = prev
        gce = None
        fidx += 1


#: structural bound on animation length — far above real animations, far
#: below a decode-time bomb (each frame costs an LZW pass)
MAX_GIF_FRAMES = 10_000


def extract_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Animated GIF → list of fully-composited (sh, sw, 3) RGB canvases,
    one per image block.  RETAINS every frame — a total-pixel guard
    (frames × screen area) bounds memory against animation bombs; for
    bounded-memory sampling use `sample_gif_frames`."""
    from wukong_spark.operators.multimodal import MAX_DECODE_PIXELS

    frames: list[np.ndarray] = []
    for fidx, canvas in _walk_composited_frames(payload):
        if (len(frames) + 2) * canvas.shape[0] * canvas.shape[1] > MAX_DECODE_PIXELS:
            raise ValueError(
                "GIF animation exceeds MAX_DECODE_PIXELS across frames"
            )
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF missing image descriptor")
    return frames


def sample_gif_frames(
    payload: bytes, n_frames: int
) -> list[tuple[int, np.ndarray]]:
    """Animated GIF → n evenly-spaced fully-composited frames as
    (frame_no, canvas), memory-bounded: a structural pre-walk counts the
    frames (no LZW), then ONE compositing pass copies only the picked
    canvases and stops after the last pick — memory is O(n_frames ·
    screen) regardless of animation length, the frame_sample contract
    the AVI path already honors."""
    from wukong_spark.operators.multimodal import MAX_DECODE_PIXELS

    total = count_gif_frames(payload)
    if total == 0:
        raise ValueError("GIF missing image descriptor")
    if total > MAX_GIF_FRAMES:
        raise ValueError(f"GIF animation declares {total} frames — bomb?")
    k = min(n_frames, total)
    picks = sorted({(i * (total - 1)) // max(k - 1, 1) for i in range(k)})
    pickset = set(picks)
    last = picks[-1]
    out: list[tuple[int, np.ndarray]] = []
    for fidx, canvas in _walk_composited_frames(payload):
        if fidx in pickset:
            if (len(out) + 2) * canvas.shape[0] * canvas.shape[1] > MAX_DECODE_PIXELS:
                raise ValueError(
                    "GIF sampled frames exceed MAX_DECODE_PIXELS"
                )
            out.append((fidx, canvas.copy()))
        if fidx >= last:
            break
    return out



def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 palette indices + (n≤256, 3) uint8 palette → GIF89a
    bytes (global color table, real LZW).  Lossless: decode_gif returns
    exactly palette[indices]."""
    h, w = indices.shape
    n = len(palette)
    assert n <= 256 and indices.max(initial=0) < n
    bits = max(1, int(n - 1).bit_length())
    size_field = bits - 1
    ct = np.zeros((2**bits, 3), np.uint8)
    ct[:n] = palette
    mcs = max(2, bits)
    rows = indices
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
        rows = indices[order]
    data = lzw_compress(rows.reshape(-1), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | size_field, 0, 0)
    out += ct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif_animation(
    entries: list[tuple],
    palette: np.ndarray,
    screen: tuple[int, int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """Animation writer for fixtures/tests.

    ``entries``: list of (indices (h, w) uint8, left, top,
    transparent_idx or None, disposal 0-3).  One global color table; a
    Graphic Control Extension precedes every frame carrying its
    transparency + disposal.  ``screen`` defaults to the tightest
    (sw, sh) covering all frame rectangles."""
    n = len(palette)
    assert n <= 256
    bits = max(1, int(n - 1).bit_length())
    ct = np.zeros((2**bits, 3), np.uint8)
    ct[:n] = palette
    mcs = max(2, bits)
    if screen is None:
        sw = max(left + idx.shape[1] for idx, left, _t, _x, _d in entries)
        sh = max(top + idx.shape[0] for idx, _l, top, _x, _d in entries)
    else:
        sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", sw, sh, 0x80 | ((bits - 1) << 4) | (bits - 1), bg_index, 0
    )
    out += ct.tobytes()
    # NETSCAPE looping extension (structurally skipped by the walks, but
    # real animations carry it — keeps fixtures realistic)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx, left, top, tidx, disposal in entries:
        h, w = idx.shape
        assert int(idx.max(initial=0)) < n and left + w <= sw and top + h <= sh
        packed = (disposal & 7) << 2 | (1 if tidx is not None else 0)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed, 4, tidx or 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0x00)
        out.append(mcs)
        data = lzw_compress(idx.reshape(-1), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
