"""TIFF 6.0 codec — baseline RGB, strips, LZW, both byte orders.

The fifth still-image compression family in the crawl's decode surface
(PNG = filter+DEFLATE, JPEG = DCT+Huffman, GIF = palette+LZW-LSB,
WebP = VP8L prefix codes; TIFF-LZW is the MSB-first *early-change*
variant of LZW, a genuinely different bitstream from GIF's). Implements
the public TIFF 6.0 specification (Adobe, 1992) from scratch:

- encode: 8-bit RGB, PhotometricInterpretation=2, configurable
  Compression (1 = none, 5 = LZW), configurable RowsPerStrip (multiple
  strips exercise real strip reassembly), II or MM byte order;
- decode: header + IFD walk (REUSES the EXIF kit's IFD reader — the same
  machinery that parses APP1 payloads parses standalone TIFF files, which
  is the point of TIFF-in-EXIF), strip concatenation, LZW with the spec's
  early code-width change, horizontal-differencing Predictor (tag 317)
  support on both encode and decode.

Reference analog: none in the reference (its payloads are HTML/PDF); this
extends the rebuild's multimodal decode dispatch per BASELINE.json's
image payload axis.
"""

from __future__ import annotations

import struct

import numpy as np

from .exifkit import _entry_value, _read_ifd
from .kitguard import rejects_malformed

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PREDICTOR = 317

_SHORT, _LONG = 3, 4

_CLEAR, _EOI = 256, 257


# ---------------------------------------------------------------------------
# TIFF-variant LZW: MSB-first bit packing, code width grows at 2^n - 1
# ("early change"), dictionary reset via ClearCode. Spec section 13.
# ---------------------------------------------------------------------------


def lzw_encode(data: bytes) -> bytes:
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    out_bits.append((_CLEAR, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = nxt
        nxt += 1
        # early change: width bumps when the NEXT code would not fit,
        # i.e. at 511/1023/2047 table entries (spec: "one count early")
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: reset
            out_bits.append((_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([ch])  # classic LZW: the unmatched char starts the next run
    if w:
        out_bits.append((table[w], width))
    out_bits.append((_EOI, width))
    # MSB-first bit packing
    acc = nbits = 0
    buf = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            buf.append((acc >> nbits) & 0xFF)
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("tiff-lzw: stream ended without EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table) or code > 255:
                raise ValueError("tiff-lzw: bad first code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff-lzw: code beyond table")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table trails the
        # encoder's by exactly one entry at each read (the encoder adds
        # within the step that emits; the decoder adds one read later), so
        # it must widen when its table reaches 2^width - 2 — one earlier
        # than the encoder's own 2^width - 1 bump point
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def tiff_encode(
    px: np.ndarray,
    compression: str = "lzw",
    byte_order: str = "II",
    rows_per_strip: int = 8,
    predictor: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB → a standalone TIFF file. ``compression``:
    'none' or 'lzw'; ``predictor`` applies horizontal differencing (tag
    317 = 2) before LZW — the layout real photo TIFFs use."""
    assert px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
    h, w, _ = px.shape
    e = "<" if byte_order == "II" else ">"
    comp = 5 if compression == "lzw" else 1

    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        rows = px[y0 : y0 + rows_per_strip]
        if predictor:
            rows = rows.astype(np.int16)
            rows = np.concatenate(
                [rows[:, :1], (rows[:, 1:] - rows[:, :-1]) % 256], axis=1
            ).astype(np.uint8)
        raw = rows.tobytes()
        strips.append(lzw_encode(raw) if comp == 5 else raw)

    n_tags = 9 + (1 if predictor else 0)
    header = 8
    ifd_size = 2 + n_tags * 12 + 4
    # layout: header | IFD | bits-per-sample array | offsets/counts arrays | strips
    bits_off = header + ifd_size
    n_strips = len(strips)
    ext = n_strips > 1  # arrays need out-of-line storage
    so_off = bits_off + 6
    sc_off = so_off + (4 * n_strips if ext else 0)
    data_off = sc_off + (4 * n_strips if ext else 0)
    offsets = []
    at = data_off
    for s in strips:
        offsets.append(at)
        at += len(s)

    def entry(tag: int, typ: int, count: int, value_field: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + value_field

    def long_field(v: int) -> bytes:
        return struct.pack(e + "I", v)

    def short_field(v: int) -> bytes:
        return struct.pack(e + "H", v) + b"\x00\x00"

    ifd = struct.pack(e + "H", n_tags)
    ifd += entry(TAG_WIDTH, _LONG, 1, long_field(w))
    ifd += entry(TAG_HEIGHT, _LONG, 1, long_field(h))
    ifd += entry(TAG_BITS, _SHORT, 3, long_field(bits_off))
    ifd += entry(TAG_COMPRESSION, _SHORT, 1, short_field(comp))
    ifd += entry(TAG_PHOTOMETRIC, _SHORT, 1, short_field(2))
    if ext:
        ifd += entry(TAG_STRIP_OFFSETS, _LONG, n_strips, long_field(so_off))
    else:
        ifd += entry(TAG_STRIP_OFFSETS, _LONG, 1, long_field(offsets[0]))
    ifd += entry(TAG_SAMPLES, _SHORT, 1, short_field(3))
    ifd += entry(TAG_ROWS_PER_STRIP, _LONG, 1, long_field(rows_per_strip))
    if ext:
        ifd += entry(TAG_STRIP_COUNTS, _LONG, n_strips, long_field(sc_off))
    else:
        ifd += entry(TAG_STRIP_COUNTS, _LONG, 1, long_field(len(strips[0])))
    if predictor:
        ifd += entry(TAG_PREDICTOR, _SHORT, 1, short_field(2))
    ifd += struct.pack(e + "I", 0)  # next IFD: none

    out = bytearray()
    out += byte_order.encode("ascii") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", header)
    out += ifd
    out += struct.pack(e + "HHH", 8, 8, 8)
    if ext:
        out += struct.pack(e + f"{n_strips}I", *offsets)
        out += struct.pack(e + f"{n_strips}I", *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)


@rejects_malformed("tiff")
def tiff_decode(payload: bytes) -> np.ndarray:
    """Standalone TIFF → (h, w, 3) uint8. Both byte orders, 1..n strips,
    Compression 1 (none) and 5 (LZW), Predictor 1/2. Raises on anything
    structurally off — same malformed-input stance as every other kit."""
    bo = payload[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise ValueError(f"tiff: bad byte order {bo!r}")
    (magic,) = struct.unpack_from(e + "H", payload, 2)
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    tags = {
        tag: _entry_value(payload, typ, count, field, e)
        for tag, typ, count, field in _read_ifd(payload, ifd_off, e)
    }
    w, h = int(tags[TAG_WIDTH]), int(tags[TAG_HEIGHT])
    comp = int(tags.get(TAG_COMPRESSION, 1))
    if comp not in (1, 5):
        raise ValueError(f"tiff: unsupported compression {comp}")
    if int(tags.get(TAG_PHOTOMETRIC, -1)) != 2:
        raise ValueError("tiff: only RGB photometric supported")
    bits = tags.get(TAG_BITS, [8, 8, 8])
    bits = bits if isinstance(bits, list) else [bits]
    if list(bits) != [8, 8, 8] or int(tags.get(TAG_SAMPLES, 3)) != 3:
        raise ValueError("tiff: only 8-bit RGB supported")
    pred = int(tags.get(TAG_PREDICTOR, 1))
    if pred not in (1, 2):
        raise ValueError(f"tiff: unsupported predictor {pred}")
    rps = int(tags.get(TAG_ROWS_PER_STRIP, h))
    offs = tags[TAG_STRIP_OFFSETS]
    cnts = tags[TAG_STRIP_COUNTS]
    offs = offs if isinstance(offs, list) else [offs]
    cnts = cnts if isinstance(cnts, list) else [cnts]
    if len(offs) != len(cnts):
        raise ValueError("tiff: strip offsets/counts length mismatch")

    rows = []
    for k, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(payload):
            raise ValueError("tiff: strip beyond stream")
        raw = payload[o : o + c]
        if comp == 5:
            raw = lzw_decode(raw)
        n_rows = min(rps, h - k * rps)
        need = n_rows * w * 3
        if len(raw) < need:
            raise ValueError("tiff: short strip")
        block = np.frombuffer(raw[:need], dtype=np.uint8).reshape(n_rows, w, 3)
        if pred == 2:
            block = np.cumsum(block.astype(np.int64), axis=1) % 256
            block = block.astype(np.uint8)
        rows.append(block)
    px = np.concatenate(rows, axis=0)
    if px.shape != (h, w, 3):
        raise ValueError("tiff: assembled shape mismatch")
    return px
