"""QOI codec ("Quite OK Image", qoiformat.org spec, 2022) — RGB.

The sixth still-image format in the decode surface, and a different
compression family again: QOI is a single-pass byte-oriented format built
from five ops (RUN / INDEX into a 64-slot seen-pixel hash table / 2-bit
DIFF / LUMA delta / literal RGB) with no entropy coder — the shape of
format a crawler increasingly meets in game/tooling assets. Implemented
from the one-page public specification; both directions raise cleanly on
malformed streams (kitguard stance).

Pixels are (h, w, 3) uint8 RGB; alpha is carried as the constant 255 the
spec initializes, and the RGBA op decodes (files from other encoders may
use it) while ours emits RGB-only ops.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

MAGIC = b"qoif"
END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_encode(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → QOI bytes (channels=3, colorspace=1/linear)."""
    assert px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
    h, w, _ = px.shape
    out = bytearray(MAGIC + struct.pack(">IIBB", w, h, 3, 1))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = px.reshape(-1, 3)
    for r, g, b in flat.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        k = _hash(r, g, b, 255)
        if index[k] == (r, g, b, 255):
            out.append(_OP_INDEX | k)
        else:
            index[k] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((_OP_RGB, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(_OP_RUN | (run - 1))
    out += END
    return bytes(out)


@rejects_malformed("qoi")
def qoi_decode(payload: bytes) -> np.ndarray:
    """QOI bytes → (h, w, 3) uint8. Decodes all five ops plus RGBA (alpha
    participates in the index hash per spec but is dropped on output);
    raises on bad magic, stream over/underrun, or a missing end marker."""
    if payload[:4] != MAGIC:
        raise ValueError("qoi: bad magic")
    w, h, channels, _cs = struct.unpack_from(">IIBB", payload, 4)
    if channels not in (3, 4):
        raise ValueError(f"qoi: bad channel count {channels}")
    if payload[-8:] != END:
        raise ValueError("qoi: missing end marker")
    data = payload[14:-8]
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i = pos = 0
    m = len(data)
    while i < n:
        if pos >= m:
            raise ValueError("qoi: stream underrun")
        op = data[pos]
        pos += 1
        if op == _OP_RGB:
            if pos + 3 > m:
                raise ValueError("qoi: truncated RGB op")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == _OP_RGBA:
            if pos + 4 > m:
                raise ValueError("qoi: truncated RGBA op")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[op & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                b = (b + (op & 3) - 2) % 256
            elif tag == _OP_LUMA:
                if pos >= m:
                    raise ValueError("qoi: truncated LUMA op")
                dg = (op & 0x3F) - 32
                nx = data[pos]
                pos += 1
                r = (r + dg + ((nx >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nx & 0x0F) - 8) % 256
            else:  # RUN
                run = (op & 0x3F) + 1
                if i + run > n:
                    raise ValueError("qoi: run overruns image")
                out[i : i + run] = (r, g, b)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b)
        i += 1
    if pos != m:
        raise ValueError("qoi: trailing bytes before end marker")
    return out.reshape(h, w, 3)
