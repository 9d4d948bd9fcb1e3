"""Baseline TIFF codec — dependency-free (numpy + stdlib).

Scanned-document and scientific corpora ship TIFF; this decoder covers
the baseline profile expressible without codec libraries: both byte
orders (II/MM), IFD walk with inline-vs-offset values, strip assembly,
8-bit greyscale (photometric 0/1, white-is-zero inverted) and RGB(A),
compression 1 (none), 32773 (PackBits RLE), and 8/32946 (Deflate, r9 —
stdlib zlib, with predictor 2 horizontal differencing) — plus a matching
writer (strip-per-rows_per_strip, none/PackBits/deflate±predictor) for
fixtures and roundtrips.

LZW (compression 5, r10): MSB-first 12-bit-max codes over the byte
alphabet (Clear=256, EOI=257), implemented with the same
encoder/decoder lockstep structure as the roundtrip-proven GIF core
(`gif.py`): the decoder sizes each read for its next assignable index,
the encoder mirrors it one step behind.  The code-width timing follows
the TIFF 6.0 / libtiff "EarlyChange" convention (width bumps one code
EARLY: 9→10 bits once the next free slot is 511, vs 512 for the
late-change variant some old encoders used).  Both conventions are
implemented and differential-tested; `decode_tiff` reads the spec
convention.  Conventions are pinned by hand-derived literal byte
vectors in tests (test_tiff_lzw_*), not by an in-container third-party
decoder — disclosed, since no libtiff/PIL ground truth ships here.

Scope (disclosed): JPEG-in-TIFF/CCITT compressions, 16-bit samples,
tiled layout, and planar configuration 2 raise NotImplementedError —
`decode_images` then falls through to its fake_decoder handling.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

#: field type → byte width (the ones baseline files use)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 8: 2, 9: 4, 11: 4, 12: 8}


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF PackBits strip truncated")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """PackBits writer: maximal repeat runs (≥3), literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a repeat run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal run: until the next ≥3 repeat or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i
            while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
                j += 1
            if j - i + 1 >= 3:
                break
            i = j + 1
        i = min(i, lit_start + 128)
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


class _MSBWriter:
    """MSB-first bit packer (TIFF LZW's bit order — opposite of GIF)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _MSBReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("TIFF LZW stream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= width
        v = (self.acc >> self.nbits) & ((1 << width) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


_LZW_CLEAR, _LZW_EOI = 256, 257


def _tiff_lzw_width(next_code: int, early_change: bool) -> int:
    """Width the decoder reads its NEXT code at, given its next
    assignable table index.  EarlyChange (TIFF 6.0/libtiff) bumps one
    code early: 9→10 bits once the next free slot is 511 (late: 512)."""
    n = next_code + 1 if early_change else next_code
    return min(12, max(9, n.bit_length()))


def tiff_lzw_compress(data: bytes, early_change: bool = True) -> bytes:
    """TIFF-variant LZW over raw bytes (MSB-first, Clear=256, EOI=257).

    Same lockstep structure as gif.lzw_compress (emit at the width of
    the DECODER's next assignable = our next_code − 1), with the
    byte alphabet fixed at 256 entries and the early-change width
    schedule.  Resets at next_code 4093 so every emitted code fits 12
    bits under either convention."""
    bw = _MSBWriter()
    table: dict[tuple[int, int], int] = {}
    next_code = _LZW_EOI + 1
    bw.write(_LZW_CLEAR, _tiff_lzw_width(next_code, early_change))
    it = iter(data)
    try:
        cur = next(it)
    except StopIteration:
        bw.write(_LZW_EOI, _tiff_lzw_width(next_code, early_change))
        return bw.flush()
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        bw.write(cur, _tiff_lzw_width(next_code - 1, early_change))
        table[(cur, k)] = next_code
        next_code += 1
        cur = k
        if next_code == 4093:
            bw.write(_LZW_CLEAR, _tiff_lzw_width(next_code - 1, early_change))
            table, next_code = {}, _LZW_EOI + 1
    bw.write(cur, _tiff_lzw_width(next_code - 1, early_change))
    bw.write(_LZW_EOI, _tiff_lzw_width(next_code, early_change))
    return bw.flush()


def tiff_lzw_decompress(
    data: bytes, expected: int, early_change: bool = True
) -> bytes:
    """Inverse of tiff_lzw_compress; stops after `expected` bytes.
    Output is size-bounded up front (no decompression bomb)."""
    rd = _MSBReader(data)
    out = bytearray()
    table: list[bytes] = []
    prev: bytes | None = None
    next_code = _LZW_EOI + 1

    while len(out) < expected:
        code = rd.read(_tiff_lzw_width(next_code, early_change))
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_code = _LZW_EOI + 1
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if not table:
            raise ValueError("TIFF LZW data before first clear code")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
        elif code == next_code and next_code < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        take = min(len(entry), expected - len(out))
        out += entry[:take]
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW strip truncated")
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (h, w, channels) uint8 array (first IFD)."""
    if payload[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (count,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(count):
        e = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, e)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw_off = e + 8
        else:
            (raw_off,) = struct.unpack_from(bo + "I", payload, e + 8)
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rationals/ASCII — not needed for the pixel path
        tags[tag] = list(
            struct.unpack_from(bo + fmt * cnt, payload, raw_off)
        )
    try:
        w, h = tags[256][0], tags[257][0]
    except KeyError:
        raise ValueError("TIFF missing dimensions")
    from wukong_spark.operators.multimodal import check_decode_dims

    check_decode_dims(w, h, "TIFF")
    bits = tags.get(258, [8])
    spp = tags.get(277, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    planar = tags.get(284, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits}")
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if comp not in (1, 32773, 8, 32946, 5):
        raise NotImplementedError(
            f"TIFF compression {comp} (none/PackBits/LZW/Deflate decode natively)"
        )
    pred = tags.get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred}")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF layout")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = tags.get(278, [h])[0]
    row_bytes = w * spp
    pieces = []
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, remaining_rows)
        raw = payload[off : off + cnt]
        if comp == 32773:
            raw = packbits_decode(raw, rows * row_bytes)
        elif comp == 5:  # LZW (EarlyChange, the TIFF 6.0/libtiff timing)
            raw = tiff_lzw_decompress(raw, rows * row_bytes)
        elif comp in (8, 32946):  # Deflate ("Adobe" and legacy tags)
            # bounded inflate (ADVICE r9): cap output at the strip's
            # declared pixel bytes so a crafted stream can't allocate
            # past the MAX_DECODE_PIXELS guard before the size check
            d = zlib.decompressobj()
            raw = d.decompress(raw, rows * row_bytes)
            if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
                raise ValueError("TIFF Deflate strip larger than declared")
        if len(raw) < rows * row_bytes:
            raise ValueError("TIFF strip data truncated")
        strip = np.frombuffer(raw, np.uint8, rows * row_bytes)
        if pred == 2:  # horizontal differencing: per-sample row cumsum
            strip = (
                strip.reshape(rows, w, spp).astype(np.uint32).cumsum(axis=1) % 256
            ).astype(np.uint8).reshape(-1)
        pieces.append(strip)
        remaining_rows -= rows
    if remaining_rows > 0:
        raise ValueError("TIFF strips cover fewer rows than declared")
    img = np.concatenate(pieces).reshape(h, w, spp)
    if photo == 0:  # white-is-zero greyscale: invert to the usual ramp
        img = 255 - img
    return np.ascontiguousarray(img)


def tiff_to_rgb(px: np.ndarray) -> np.ndarray:
    """Native-channel decode → (h, w, 3) RGB (grey broadcast, alpha drop)."""
    ch = px.shape[2]
    if ch <= 2:  # grey or grey+alpha: broadcast the luma channel
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 16,
    predictor: bool = False,
) -> bytes:
    """(h, w[, channels]) uint8 → little-endian baseline TIFF bytes.
    ``predictor=True`` writes tag 317=2 (horizontal differencing before
    compression — the combination real Deflate/LZW TIFFs use)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    comp_tag = {"none": 1, "packbits": 32773, "deflate": 8, "lzw": 5}[compression]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = np.ascontiguousarray(px[y0 : y0 + rows_per_strip])
        if predictor:
            d = block.astype(np.int16)
            d[:, 1:] = d[:, 1:] - block[:, :-1].astype(np.int16)
            raw = (d % 256).astype(np.uint8).tobytes()
        else:
            raw = block.tobytes()
        if comp_tag == 32773:
            strips.append(packbits_encode(raw))
        elif comp_tag == 5:
            strips.append(tiff_lzw_compress(raw))
        elif comp_tag == 8:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(raw)

    n_tags = 10 if predictor else 9
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4  # entries + next-IFD pointer
    # out-of-line areas: bits-per-sample array (if ch>2), offsets, counts
    extra = bytearray()

    def alloc(values: list[int], fmt: str) -> int:
        nonlocal extra
        off = data_off + len(extra)
        extra += struct.pack("<" + fmt * len(values), *values)
        return off

    # TIFF inline rule: values whose total size ≤ 4 bytes live IN the
    # value field, not behind an offset — 1 short inlines as 8, 2 shorts
    # pack little-endian into the field; ≥3 go out-of-line
    if ch == 1:
        bits_val = (8, None)
    elif ch == 2:
        bits_val = (8 | (8 << 16), None)
    else:
        bits_val = (alloc([8] * ch, "H"), None)
    strip_data_off = None  # filled after extra is final

    # lay out the strip data after the extra area; two passes because the
    # offsets array itself lives in extra
    counts = [len(s) for s in strips]
    # reserve offsets/counts arrays (or inline when single-strip)
    if len(strips) == 1:
        off_entry = ("inline", 0)
        cnt_entry = ("inline", counts[0])
    else:
        off_entry = ("offset", alloc([0] * len(strips), "I"))
        cnt_entry = ("offset", alloc(counts, "I"))
    strip_base = data_off + len(extra)
    offs = []
    acc = strip_base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    if len(strips) == 1:
        off_entry = ("inline", offs[0])
    else:
        struct.pack_into("<" + "I" * len(offs), extra, off_entry[1] - data_off, *offs)

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        return struct.pack("<HHII", tag, typ, cnt, val)

    entries = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        entry(258, 3, ch, bits_val[0]),
        entry(259, 3, 1, comp_tag),
        entry(262, 3, 1, 1 if ch <= 2 else 2),
        entry(273, 4, len(strips), off_entry[1]),
        entry(277, 3, 1, ch),
        entry(278, 4, 1, rows_per_strip),
        entry(279, 4, len(strips), cnt_entry[1]),
    ]
    if predictor:
        entries.append(entry(317, 3, 1, 2))
    ifd = struct.pack("<H", n_tags) + b"".join(entries) + struct.pack("<I", 0)
    head = b"II*\x00" + struct.pack("<I", ifd_off)
    return head + ifd + bytes(extra) + b"".join(strips)
