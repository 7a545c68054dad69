"""Real MJPEG-in-AVI video codec — RIFF AVI container over baseline JPEG.

The compressed-video analog of functions/jpegkit.py: every frame is a
genuine baseline-JPEG bitstream (DCT + Annex-K quantization + Huffman,
functions/jpegkit.py) wrapped in a standards-correct AVI RIFF container
(``hdrl`` with avih/strh/strf headers, ``movi`` with ``00dc`` frame chunks,
``idx1`` keyframe index) — Motion-JPEG, the format real capture devices and
browsers emit. This retires the former mp4 stub with an actually-compressed
video family: DCT+Huffman per frame, ~8-20:1 vs raw RGB at quality 90.

Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52); the Spark-side
dispatch is operators/multimodal.py:frame_sample.

Scale shape: decode parallelism is the video count (one Arrow task decodes
one payload's frames), identical to the y4m lane — a long-tail video costs
only its own task, and no per-frame rows ever shuffle with pixel data
attached.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

from . import jpegkit


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode(frames: np.ndarray, fps: int = 25, quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → AVI/MJPG bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    jpegs = [jpegkit.jpeg_encode(frames[i], quality=quality) for i in range(n)]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        n, 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # dwScale / dwRate → fps
        0, n, max_sz, 0xFFFFFFFF, 0,
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"movi"
    offsets = []  # offset of each chunk relative to the 'movi' fourcc
    for j in jpegs:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_payload)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + size > end:
            raise ValueError("avi: truncated chunk")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def _check_riff(body: bytes) -> None:
    if body[:4] != b"RIFF" or body[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", body, 4)
    if riff_size != len(body) - 8:
        raise ValueError("avi: truncated container (RIFF size mismatch)")


@rejects_malformed("avi")
def avi_decode(body: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPG bytes → ((n, h, w, 3) uint8 RGB frames, fps)."""
    _check_riff(body)
    fps = 25
    jpegs: list[bytes] = []

    def scan(pos: int, end: int) -> None:
        nonlocal fps
        for fourcc, p, size in _walk(body, pos, end):
            if fourcc == b"LIST":
                scan(p + 4, p + size)  # recurse past the list type
            elif fourcc == b"strh" and body[p : p + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", body, p + 20)
                if scale:
                    fps = rate // scale
            elif fourcc == b"00dc" and size > 0:
                jpegs.append(body[p : p + size])

    scan(12, len(body))
    if not jpegs:
        raise ValueError("avi: no 00dc MJPG frames found")
    frames = np.stack([jpegkit.jpeg_decode(j) for j in jpegs])
    return frames, fps


@rejects_malformed("avi")
def avi_header_info(body: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) straight from avih/strh without decoding frames
    — the container-structure probe the codec-lane oracle checks."""
    _check_riff(body)
    w = h = n = 0
    fps = 25

    def scan(pos: int, end: int) -> None:
        nonlocal w, h, n, fps
        for fourcc, p, size in _walk(body, pos, end):
            if fourcc == b"LIST":
                scan(p + 4, p + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<10I", body, p)
                n, w, h = vals[4], vals[8], vals[9]
            elif fourcc == b"strh" and body[p : p + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", body, p + 20)
                if scale:
                    fps = rate // scale

    scan(12, len(body))
    return w, h, n, fps
