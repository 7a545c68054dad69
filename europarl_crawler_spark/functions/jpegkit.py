"""Baseline JPEG (ITU T.81 / JFIF) codec — pure numpy + stdlib.

The web's dominant image format, implemented for real: 8×8 DCT-II,
quality-scaled Annex-K quantization tables, zigzag + DC-differential +
run-length entropy coding with the standard Huffman tables, JFIF container
with byte stuffing. 4:4:4 sampling (one 8×8 block per component per MCU),
8-bit, interleaved, no restart markers — the simplest fully-conformant
baseline stream; any mainstream decoder reads the output.

The decoder parses the real marker structure (DQT/DHT/SOF0/SOS) and decodes
with the tables FROM THE STREAM, so it also reads externally-produced
baseline 4:4:4 JPEGs; progressive/4:2:0 inputs get a clear error.

Quality ≥ ~97 keeps PSNR ≥ 40 dB even on noise payloads (quant steps → 1,
residual error is DCT/color-transform rounding) — the serving quality for
the crawl's lossy-invariant lane; typical web quality (75-90) is supported
and tested on smooth content.

Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52) — here the html lane's
payloads become genuine JPEG/PNG streams instead of toy formats.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

# ---------------------------------------------------------------------------
# constant tables (ITU T.81 Annex K — public standard)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DCT8 = None


def _dct_matrix8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)[:, None]
        i = np.arange(8)[None, :]
        m = np.sqrt(2.0 / 8) * np.cos(np.pi * (2 * i + 1) * k / 16.0)
        m[0, :] = np.sqrt(1.0 / 8)
        _DCT8 = m
    return _DCT8


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    sf = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * sf + 50) // 100, 1, 255).astype(np.int64)


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_huffman(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def jpeg_encode(
    px: np.ndarray,
    quality: int = 85,
    comment: str | None = None,
    exif: bytes | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, standard tables).

    ``comment`` (optional) embeds a COM segment (marker 0xFFFE, T.81 §B.2.4.5)
    after APP0, UTF-8 encoded — the field crawlers mine for captions/credits.
    ``exif`` (optional) embeds a prebuilt APP1 payload (exifkit.exif_build)
    as marker 0xFFE1 right after APP0 — Exif 2.3's placement. Omitted, the
    output stays byte-identical. A comment beyond one segment's 65533-byte
    payload raises (splitting would shear UTF-8 sequences across segments;
    captions don't approach 64 KB)."""
    h, w, _ = px.shape
    qy = _quality_scale(QUANT_LUM, quality)
    qc = _quality_scale(QUANT_CHROM, quality)
    d = _dct_matrix8()

    # pad to 8×8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(px)
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_y = _build_huffman(DC_LUM_BITS, DC_LUM_VALS)
    ac_y = _build_huffman(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_huffman(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _build_huffman(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                q = qy if comp == 0 else qc
                dct = d @ (padded[by : by + 8, bx : bx + 8, comp] - 128.0) @ d.T
                coef = np.round(dct / q).astype(np.int64).flatten()[ZIGZAG]
                dch, ach = (dc_y, ac_y) if comp == 0 else (dc_c, ac_c)
                diff = int(coef[0]) - prev_dc[comp]
                prev_dc[comp] = int(coef[0])
                cat = _category(diff)
                code, length = dch[cat]
                bw.write(code, length)
                if cat:
                    bw.write(_amplitude_bits(diff, cat), cat)
                run = 0
                nz = np.nonzero(coef[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for i in range(1, last + 1):
                    v = int(coef[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ach[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    cat = _category(v)
                    code, length = ach[(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(_amplitude_bits(v, cat), cat)
                    run = 0
                if last < 63:
                    code, length = ach[0x00]  # EOB
                    bw.write(code, length)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    apps = []
    if exif is not None:
        if len(exif) > 65533:
            raise ValueError("jpeg: exif exceeds one APP1 segment (65533 bytes)")
        apps.append(seg(0xFFE1, exif))
    if comment is not None:
        cb = comment.encode("utf-8")
        if len(cb) > 65533:
            raise ValueError("jpeg: comment exceeds one COM segment (65533 bytes)")
        apps.append(seg(0xFFFE, cb))
    out = [
        b"\xff\xd8",  # SOI
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
        *apps,
        seg(0xFFDB, b"\x00" + bytes(qy.flatten()[ZIGZAG].astype(np.uint8))),
        seg(0xFFDB, b"\x01" + bytes(qc.flatten()[ZIGZAG].astype(np.uint8))),
        seg(
            0xFFC0,  # SOF0 baseline
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        ),
        seg(0xFFC4, dht(0x00, DC_LUM_BITS, DC_LUM_VALS)),
        seg(0xFFC4, dht(0x10, AC_LUM_BITS, AC_LUM_VALS)),
        seg(0xFFC4, dht(0x01, DC_CHROM_BITS, DC_CHROM_VALS)),
        seg(0xFFC4, dht(0x11, AC_CHROM_BITS, AC_CHROM_VALS)),
        seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])),
        entropy,
        b"\xff\xd9",  # EOI
    ]
    return b"".join(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError("jpeg: unexpected marker in entropy data")
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


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


@rejects_malformed("jpeg")
def jpeg_comments(body: bytes) -> list[str]:
    """All COM segments (marker 0xFFFE) before the scan, UTF-8 decoded in
    stream order — the crawl-side caption/credit mining surface. Walks the
    same marker structure as the decoder (bad alignment raises); stops at
    SOS/EOI since COM cannot occur inside entropy data."""
    if body[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    out: list[str] = []
    while pos + 4 <= len(body):
        if body[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker alignment at {pos}")
        marker = body[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS
            break
        seg_len = struct.unpack(">H", body[pos + 2 : pos + 4])[0]
        if marker == 0xFE:
            out.append(body[pos + 4 : pos + 2 + seg_len].decode("utf-8"))
        pos += 2 + seg_len
    return out


@rejects_malformed("jpeg")
def jpeg_decode(body: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB. Decodes with the tables
    embedded in the stream; baseline 4:4:4 only (progressive / subsampled
    streams raise with a clear message)."""
    if body[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    scan: list[tuple[int, int, int]] = []  # (comp_index, td, ta)
    data_start = -1
    while pos < len(body):
        if body[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker alignment at {pos}")
        marker = body[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", body[pos + 2 : pos + 4])[0]
        payload = body[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per marker)
            o = 0
            while o < len(payload):
                pq, tq = payload[o] >> 4, payload[o] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables supported")
                tbl = np.frombuffer(payload[o + 1 : o + 65], dtype=np.uint8)
                qt[tq] = tbl.astype(np.int64)[UNZIGZAG].reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(payload):
                tc, th = payload[o] >> 4, payload[o] & 0xF
                bits = list(payload[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(payload[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nc != 3:
                raise ValueError("jpeg: only 8-bit 3-component baseline supported")
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("jpeg: only 4:4:4 sampling supported")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("jpeg: only baseline (SOF0) supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for si in range(ns):
                cid = payload[1 + 2 * si]
                td, ta = payload[2 + 2 * si] >> 4, payload[2 + 2 * si] & 0xF
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, td, ta))
            data_start = pos
            break
    if data_start < 0 or not comps:
        raise ValueError("jpeg: no scan data")
    # entropy data runs until EOI; a body with no EOI marker is a truncated
    # download even when the entropy bits happen to decode completely
    end = body.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("jpeg: missing EOI (truncated stream)")
    br = _BitReader(body[data_start:end])
    d = _dct_matrix8()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = np.zeros((3, ph, pw), dtype=np.float64)
    prev_dc = [0, 0, 0]

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp_idx, td, ta in scan:
                dct_tab = huff[(0, td)]
                ac_tab = huff[(1, ta)]
                q = qt[comps[comp_idx][2]]
                coef = np.zeros(64, dtype=np.int64)
                cat = read_symbol(dct_tab)
                diff = _extend(br.read_bits(cat), cat) if cat else 0
                prev_dc[comp_idx] += diff
                coef[0] = prev_dc[comp_idx]
                k = 1
                while k < 64:
                    rs = read_symbol(ac_tab)
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    coef[k] = _extend(br.read_bits(size), size)
                    k += 1
                block = (coef[UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                planes[comp_idx, by : by + 8, bx : bx + 8] = (
                    d.T @ block @ d
                ) + 128.0
    ycc = np.stack([planes[0], planes[1], planes[2]], axis=-1)[:h, :w]
    return _ycbcr_to_rgb(ycc)
