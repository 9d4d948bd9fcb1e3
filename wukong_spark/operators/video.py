"""Motion-JPEG AVI container codec — dependency-free (numpy + stdlib).

Upgrades the video leg of the multimodal surface from stub to REAL for
the one video format expressible without codec libraries: an AVI (RIFF)
container walk — LIST/hdrl/strl headers, LIST movi frame chunks
('00dc'/'00db'), idx1 tolerated but not required — whose frames are
baseline JPEGs decoded by operators/jpeg.py.  Plus a minimal MJPEG-AVI
writer for fixture generation and roundtrip tests.

Scope (disclosed): MJPG video streams only.  Inter-frame codecs (H.264,
VP9, …) need real codec libraries and raise NotImplementedError — the
`frame_sample` operator then falls back to its fake_decoder handling.
"""

from __future__ import annotations

import struct

import numpy as np

from wukong_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg, encode_jpeg


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_len, list_type) over a RIFF chunk
    range — offsets are absolute, so nested ranges need no byte searches
    (a 'movi' fourcc inside JPEG entropy data must never confuse the
    walk)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        ln = min(ln, max(0, end - body_start))  # clamp corrupt lengths
        if cid == b"LIST":
            yield cid, body_start + 4, ln - 4, data[body_start : body_start + 4]
        else:
            yield cid, body_start, ln, None
        pos = body_start + ln + (ln & 1)  # chunks are word-aligned


def probe_avi(payload: bytes) -> dict:
    """AVI bytes → {n_frames, width, height, fps, fourcc} from the
    hdrl headers."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    info = {"n_frames": 0, "width": 0, "height": 0, "fps": 0.0, "fourcc": ""}
    for cid, start, ln, ltype in _chunks(payload, 12, len(payload)):
        if cid != b"LIST" or ltype != b"hdrl":
            continue
        for cid2, s2, l2, lt2 in _chunks(payload, start, start + ln):
            if cid2 == b"avih":
                # MainAVIHeader: usecPerFrame, maxBytesPerSec, padding,
                # flags, totalFrames, initialFrames, streams, bufSize,
                # width, height
                (usec_pf, _, _, _, frames, _, _, _, width, height) = (
                    struct.unpack_from("<IIIIIIIIII", payload, s2)
                )
                info["n_frames"] = frames
                info["width"], info["height"] = width, height
                info["fps"] = 1e6 / usec_pf if usec_pf else 0.0
            elif cid2 == b"LIST" and lt2 == b"strl":
                for cid3, s3, l3, _ in _chunks(payload, s2, s2 + l2):
                    if cid3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                        info["fourcc"] = payload[s3 + 4 : s3 + 8].decode(
                            "ascii", "replace"
                        )
        break
    return info


def extract_frames(
    payload: bytes, indices: list[int] | None = None
) -> list[tuple[int, np.ndarray]]:
    """AVI bytes → [(frame_no, (h, w, 3) uint8 RGB)] for the requested
    frame numbers (all frames when None).  Only MJPG streams decode; a
    non-JPEG frame chunk raises NotImplementedError naming the fourcc."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    want = set(indices) if indices is not None else None
    out: list[tuple[int, np.ndarray]] = []
    frame_no = 0
    for cid, start, ln, ltype in _chunks(payload, 12, len(payload)):
        if cid != b"LIST" or ltype != b"movi":
            continue
        for fcc, fs, fl, _ in _chunks(payload, start, start + ln):
            if fcc[2:4] not in (b"dc", b"db"):
                continue  # ix00 indexes, audio '01wb', padding 'JUNK'
            if want is None or frame_no in want:
                fbody = payload[fs : fs + fl]
                if fbody[:2] != JPEG_MAGIC:
                    info = probe_avi(payload)
                    raise NotImplementedError(
                        f"AVI stream fourcc {info['fourcc']!r} is not MJPG — "
                        "inter-frame codecs need real codec libraries"
                    )
                out.append((frame_no, decode_jpeg(fbody)))
            frame_no += 1
        break
    return out


def count_frames(payload: bytes) -> int:
    """Frame count from the movi list itself (headers lie in the wild)."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    n = 0
    for cid, start, ln, ltype in _chunks(payload, 12, len(payload)):
        if cid == b"LIST" and ltype == b"movi":
            n = sum(
                1
                for fcc, _, _, _ in _chunks(payload, start, start + ln)
                if fcc[2:4] in (b"dc", b"db")
            )
            break
    return n


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → MJPEG AVI bytes (structurally
    valid: avih/strl headers + movi '00dc' JPEG chunks + idx1)."""
    assert frames, "encode_mjpeg_avi needs at least one frame"
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(jpegs), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # strh after the two fourccs: flags, prio, lang, initialFrames, scale,
    # rate, start, length, bufSize, quality, sampleSize; then rcFrame
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), 0, 0xFFFFFFFF, 0
        )
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    off = 4
    idx_entries = []
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
