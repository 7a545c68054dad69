"""Pure-python/numpy GIF87a codec (CompuServe spec / W3C GIF89a grammar).

Third REAL compressed image format of the image lane, and a different
compression family from the other two: PNG is filter+DEFLATE
(functions/imaging.py), JPEG is DCT+Huffman (functions/jpegkit.py), GIF is
palette indexing + LZW dictionary coding. The reference dispatches its
extract stage per filetype (reference: europarl/rules/extraction.py:27-52);
this module extends the rebuild's per-``fmt`` dispatch the same way.

Scope (and why it is honest):

- **Exact palette only.** GIF's hard format limit is a 256-entry color
  table. The encoder builds the image's exact palette and raises
  ``ValueError`` beyond 256 distinct colors instead of silently
  color-quantizing (which would break the input_hint's decoded-pixel
  invariant). Any tile with ≤256 pixels — the crawl's 8 px and 16 px
  thumbnails — is therefore ALWAYS losslessly encodable; larger tiles route
  to PNG/JPEG in the synthetic web, exactly how a real pipeline picks
  formats by content.
- **Full LZW**, both directions: variable code width 3..12 bits LSB-first,
  clear/EOI codes, width growth at the decoder-synchronized boundary
  (encoder grows at ``next_code == (1 << width) + 1`` because its table
  runs one entry ahead of the decoder's), table reset via CLEAR when the
  4096-entry space fills, and the ``cScSc`` (code == next_code) decode
  case.
- The decoder also accepts GIF89a files, skips extension blocks, and
  honors local color tables and Appendix-E interlacing, so externally-produced GIFs
  decode too — it is a real decoder, not just the encoder's inverse.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

MAX_COLORS = 256
_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096 LZW codes


# ---------------------------------------------------------------------------
# palette
# ---------------------------------------------------------------------------


def _pack24(px: np.ndarray) -> np.ndarray:
    """(n, 3) uint8 → (n,) uint32 packed 0xRRGGBB (lexicographic order of
    (r, g, b) == numeric order of the packed int)."""
    p = px.astype(np.uint32)
    return (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]


def exact_palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 → (palette (k, 3) uint8 sorted lexicographically,
    indices (h*w,) — deterministic for a given image. Raises ``ValueError``
    if the image has more than 256 distinct colors (GIF's format limit)."""
    flat = pixels.reshape(-1, 3)
    packed = _pack24(flat)
    uniq, idx = np.unique(packed, return_inverse=True)
    if uniq.size > MAX_COLORS:
        raise ValueError(
            f"GIF palette overflow: {uniq.size} distinct colors > {MAX_COLORS}"
        )
    pal = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    return pal, idx.astype(np.int32)


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs the low bit of each code first)."""

    def __init__(self):
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
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over palette indices. Emits CLEAR first (per spec
    recommendation), resets the table via CLEAR when it reaches 4096
    entries, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    bw.write(clear, width)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    it = iter(int(i) for i in indices)
    try:
        prefix = next(it)
    except StopIteration:
        bw.write(eoi, width)
        return bw.flush()
    for k in it:
        key = (prefix, k)
        hit = table.get(key)
        if hit is not None:
            prefix = hit
            continue
        bw.write(prefix, width)
        table[key] = next_code
        next_code += 1
        # the encoder's table runs ONE entry ahead of the decoder's (the
        # decoder adds its entry only after reading the NEXT code), so the
        # width-growth boundary is (1 << width) + 1 here vs (1 << width)
        # in lzw_decode — off-by-one'ing this desynchronizes every code
        # after the first boundary (tested at both 512- and 4096-entry
        # boundaries in tests/test_gif.py).
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code == _TABLE_LIMIT:
            bw.write(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = k
    bw.write(prefix, width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of ``lzw_encode``; also decodes any spec-conforming stream
    (deferred clears, missing final EOI). Returns (n_expected,) int32."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.int32)
    pos = 0
    acc = 0
    nbits = 0
    byte_i = 0
    width = min_code_size + 1
    # table: code -> (prefix_code | -1, last_index); strings materialized by
    # walking prefixes, O(len) per output with no per-entry list copies.
    prefix_of = np.full(_TABLE_LIMIT, -1, dtype=np.int32)
    last_of = np.zeros(_TABLE_LIMIT, dtype=np.int32)
    first_of = np.zeros(_TABLE_LIMIT, dtype=np.int32)
    length_of = np.zeros(_TABLE_LIMIT, dtype=np.int32)
    for c in range(clear):
        last_of[c] = first_of[c] = c
        length_of[c] = 1
    next_code = eoi + 1
    prev = -1

    def emit(code: int) -> None:
        nonlocal pos
        n = int(length_of[code])
        if pos + n > n_expected:
            raise ValueError("LZW output overruns image size")
        c = code
        for j in range(n - 1, -1, -1):
            out[pos + j] = last_of[c]
            c = prefix_of[c]
        pos += n

    while True:
        while nbits < width:
            if byte_i >= len(data):
                if pos != n_expected:
                    raise ValueError("LZW stream truncated")
                return out
            acc |= data[byte_i] << nbits
            byte_i += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            if pos != n_expected:
                raise ValueError(f"LZW ended early: {pos}/{n_expected}")
            return out
        if prev < 0:
            if code >= clear:
                raise ValueError("first LZW code after clear is not a root")
            emit(code)
            prev = code
            continue
        if code > next_code or (code >= next_code and next_code >= _TABLE_LIMIT):
            raise ValueError(f"LZW code {code} out of range (next={next_code})")
        if next_code < _TABLE_LIMIT:
            # new entry = string(prev) + first_char(current); for the
            # cScSc case (code == next_code) that first char is prev's own
            new = next_code
            prefix_of[new] = prev
            first_of[new] = first_of[prev]
            last_of[new] = first_of[prev] if code == next_code else first_of[code]
            length_of[new] = length_of[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        emit(code)
        prev = code


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def gif_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → GIF87a bytes. Lossless (exact palette); raises
    ``ValueError`` above 256 distinct colors — see module docstring."""
    h, w, c = pixels.shape
    assert c == 3, "RGB only"
    pal, idx = exact_palette(pixels)
    # global color table size is a power of two; mcs ≥ 2 per spec
    gct_bits = max(1, int(np.ceil(np.log2(max(pal.shape[0], 2)))))
    gct_n = 1 << gct_bits
    mcs = max(2, gct_bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((gct_bits - 1) & 0x07))  # GCT present, 2^gct_bits entries
    out += b"\x00\x00"  # background index, aspect ratio
    out += pal.tobytes() + b"\x00" * (3 * (gct_n - pal.shape[0]))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    body = lzw_encode(idx, mcs)
    for i in range(0, len(body), 255):
        blk = body[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


@rejects_malformed("gif")
def gif_decode(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8. Accepts GIF87a/GIF89a, skips extension
    blocks, honors a local color table and four-pass interlacing."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF magic")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    p = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=p)
        gct = gct.reshape(n, 3)
        p += 3 * n
    while p < len(payload):
        b = payload[p]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + sub-blocks
            p += 2
            while payload[p] != 0:
                p += 1 + payload[p]
            p += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, p + 1)
        ipacked = payload[p + 9]
        p += 10
        interlaced = bool(ipacked & 0x40)
        table = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=p
            ).reshape(n, 3)
            p += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[p]
        p += 1
        body = bytearray()
        while payload[p] != 0:
            ln = payload[p]
            body += payload[p + 1 : p + 1 + ln]
            p += 1 + ln
        p += 1
        idx = lzw_decode(bytes(body), mcs, w * h)
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("palette index out of range")
        assert (left, top, w, h) == (0, 0, sw, sh), "sub-rectangle frames unsupported"
        # require the 0x3B trailer (extensions may precede it): a download cut
        # right before the trailer is truncated even though the image decoded
        while p < len(payload) and payload[p] == 0x21:
            p += 2
            while payload[p] != 0:
                p += 1 + payload[p]
            p += 1
        if p >= len(payload) or payload[p] != 0x3B:
            raise ValueError("gif: missing trailer (truncated stream)")
        px = table[idx].reshape(h, w, 3).copy()
        if interlaced:
            # GIF89a appendix E: rows stored in four passes
            # (8k, 8k+4, 4k+2, 2k+1); de-permute back to display order
            order = np.concatenate(
                [np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        return px
    raise ValueError("no image block in GIF")
