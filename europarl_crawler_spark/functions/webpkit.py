"""Real WebP lossless (VP8L) codec — pure stdlib + numpy.

Implements the public WebP Lossless Bitstream Specification (RFC 9649):

- **Decoder** (``webp_decode``): the full VP8L feature set — all four
  transforms (predictor with the 14 spatial modes, color transform,
  subtract-green, color-indexing with pixel bundling), color cache,
  LZ77 backward references with the 120-entry 2D distance mapping, simple
  AND normal prefix codes (code-length codes with 16/17/18 repeats and the
  max_symbol shortcut), and meta prefix groups via a recursively decoded
  entropy image. Files from other encoders (cwebp -lossless) decode.
- **Encoder** (``webp_encode``): a deterministic spec-valid subset — no
  transforms, no color cache, a single prefix group, literal-only coding
  with per-channel canonical prefix codes (simple codes for 1-2 symbol
  channels, normal codes otherwise). Any VP8L decoder reads its output;
  round-trips are bit-exact (VP8L is lossless).

This retires the repo's last stubbed image format: the crawl's extract
stage (operators/multimodal.py) now decodes every image format it serves.
Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52).

Cost model: per-payload Python with numpy per-row work where possible —
identical to jpegkit/gifkit: parallelism is the payload count inside Arrow
batches, never a per-pixel shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

# Code-length-code read order (spec §"normal code length code").
K_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map for LZ77 distance codes 1..120: byte = (y << 4) | (x + 8).
# Spec's dist_map ordering (near offsets first); codes > 120 are linear.
K_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]

HASH_MUL = 0x1E35A7BD  # color-cache multiplier (spec)


class BitReader:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("vp8l: bitstream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class BitWriter:
    """LSB-first bit writer (VP8L bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are read MSB-of-code-first: emit reversed."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class PrefixCode:
    """Canonical prefix decoder: codes assigned by (length, symbol) order,
    decoded bit-by-bit (first bit read = MSB of the code)."""

    __slots__ = ("counts", "symbols", "single", "pair")

    @classmethod
    def from_simple(cls, symbols: list[int]) -> "PrefixCode":
        """Simple codes are POSITIONAL: the first written symbol gets code
        0, the second code 1 — regardless of numeric order (spec)."""
        self = cls.__new__(cls)
        self.counts = self.symbols = None
        if len(symbols) == 1:
            self.single, self.pair = symbols[0], None
        else:
            self.single, self.pair = None, tuple(symbols)
        return self

    def __init__(self, lengths: list[int]):
        self.pair = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.counts = self.symbols = None
            return
        self.single = None
        max_len = max(l for l, _ in nz)
        counts = [0] * (max_len + 1)
        for l, _ in nz:
            counts[l] += 1
        # completeness (Kraft equality) — required by the spec
        kraft = sum(c << (max_len - l) for l, c in enumerate(counts) if l)
        if kraft != (1 << max_len):
            raise ValueError("vp8l: prefix code not complete")
        self.counts = counts
        self.symbols = [s for _, s in sorted(nz)]

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.pair is not None:
            return self.pair[br.read(1)]
        code = 0
        first = 0  # first canonical code of this length
        index = 0  # symbols consumed by shorter lengths
        for l in range(1, len(self.counts)):
            code = (code << 1) | br.read(1)
            cnt = self.counts[l]
            if code - first < cnt:
                return self.symbols[index + code - first]
            index += cnt
            first = (first + cnt) << 1
        raise ValueError("vp8l: bad prefix code in stream")


def _canonical_codes(lengths: list[int]) -> list[int]:
    """Canonical code values for given lengths ((length, symbol) order)."""
    max_len = max(lengths, default=0)
    codes = [0] * len(lengths)
    code = 0
    for l in range(1, max_len + 1):
        for s, sl in enumerate(lengths):
            if sl == l:
                codes[s] = code
                code += 1
        code <<= 1
    return codes


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    """One <prefix code>: simple (1-2 symbols) or normal (code-length coded)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("vp8l: simple-code symbol out of range")
        return PrefixCode.from_simple(syms)

    num_code_lengths = 4 + br.read(4)
    ccl = [0] * 19
    for i in range(num_code_lengths):
        ccl[K_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(ccl)

    if br.read(1):  # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("vp8l: max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return PrefixCode(lengths)


def _prefix_value(br: BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding: code → value (1-based)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_key(argb: int, bits: int) -> int:
    return ((argb * HASH_MUL) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """<spatially coded image>: color-cache info, optional meta prefix
    groups (level 0 only), prefix codes, LZ77-coded ARGB data."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color-cache size")
        cache = [0] * (1 << cache_bits)

    meta_image = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_image = _decode_entropy_image(br, mw, mh, allow_meta=False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta_image) + 1

    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = w * h
    pixels = [0] * n
    pos = 0
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta_image else 0
    while pos < n:
        if meta_image is not None:
            x, y = pos % w, pos // w
            mp = meta_image[(y >> meta_bits) * mw + (x >> meta_bits)]
            g_code, r_code, b_code, a_code, d_code = groups[(mp >> 8) & 0xFFFF]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = g_code.read(br)
        if s < 256:  # literal
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 256 + 24:  # LZ77 backward reference
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, d_code.read(br))
            if dist_code > 120:
                distance = dist_code - 120
            else:
                plane = K_CODE_TO_PLANE[dist_code - 1]
                yoff, xoff = plane >> 4, (plane & 0xF) - 8
                distance = max(1, yoff * w + xoff)
            if pos + length > n or distance > pos:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - distance]
                pixels[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            pixels[pos] = cache[s - 256 - 24]
            pos += 1
    return pixels


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((a & 0xFF) + (b & 0xFF)) >> 1
    )


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 sum."""
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _select(t: int, l: int, tl: int) -> int:
    pl = sum(
        abs(((l >> s) & 0xFF) - ((tl >> s) & 0xFF)) for s in (0, 8, 16, 24)
    )
    pt = sum(
        abs(((t >> s) & 0xFF) - ((tl >> s) & 0xFF)) for s in (0, 8, 16, 24)
    )
    return t if pl <= pt else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for s in (0, 8, 16, 24):
        v = ((l >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
        out |= (0 if v < 0 else (255 if v > 255 else v)) << s
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for s in (0, 8, 16, 24):
        a = (ave >> s) & 0xFF
        b = (tl >> s) & 0xFF
        v = a + int((a - b) / 2)  # trunc toward zero (spec)
        out |= (0 if v < 0 else (255 if v > 255 else v)) << s
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"vp8l: invalid predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-8bit(t) * signed-8bit(c) >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_predictor(pixels: list[int], w: int, h: int, bits: int, sub: list[int]) -> None:
    sw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]  # first row: L
            elif x == 0:
                pred = pixels[i - w]  # first column: T
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                l = pixels[i - 1]
                t = pixels[i - w]
                tl = pixels[i - w - 1]
                # contiguous-array TR (spec): at x == w-1 this is the first
                # (already reconstructed) pixel of the CURRENT row
                tr = pixels[i - w + 1]
                pred = _predict(mode, l, t, tr, tl)
            pixels[i] = _add_px(pixels[i], pred)


def _inv_color_transform(pixels: list[int], w: int, h: int, bits: int, sub: list[int]) -> None:
    sw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            cte = sub[(y >> bits) * sw + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = pixels[y * w + x]
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            pixels[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pixels: list[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inv_color_indexing(
    packed: list[int], w: int, h: int, palette: list[int]
) -> list[int]:
    bits = _palette_width_bits(len(palette))
    if bits == 0:
        out = []
        for px in packed:
            idx = (px >> 8) & 0xFF
            out.append(palette[idx] if idx < len(palette) else 0)
        return out
    xcount = 1 << bits  # indices per packed pixel
    ibits = 8 >> bits  # bits per index
    mask = (1 << ibits) - 1
    pw = (w + xcount - 1) >> bits
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed_px = packed[y * pw + (x >> bits)]
            idx = ((packed_px >> 8) >> ((x & (xcount - 1)) * ibits)) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


@rejects_malformed("webp")
def webp_decode(body: bytes) -> np.ndarray:
    """WebP/VP8L bytes → (h, w, 3) uint8 RGB (alpha dropped — the repo's
    image tables are RGB; decoded alpha is honored during reconstruction)."""
    if body[:4] != b"RIFF" or body[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP file")
    (riff_size,) = struct.unpack_from("<I", body, 4)
    if riff_size != len(body) - 8:
        # the RIFF header states the container's exact byte length; any
        # disagreement is a truncated (or padded) download — reject before
        # touching the bitstream so the extract stage gets a clean error
        raise ValueError("webp: truncated container (RIFF size mismatch)")
    pos = 12
    payload = None
    while pos + 8 <= len(body):
        fourcc = body[pos : pos + 4]
        (size,) = struct.unpack_from("<I", body, pos + 4)
        if pos + 8 + size > len(body):
            raise ValueError("webp: truncated chunk")
        if fourcc == b"VP8L":
            payload = body[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size % 2)
    if payload is None:
        raise ValueError("webp: no VP8L chunk (lossy VP8 not supported)")
    if not payload or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")

    # transforms, in stream order; inverses applied in reverse order.
    # color-indexing reduces the coded width for everything read after it,
    # so each transform records the width of the image it applies to.
    transforms: list[tuple] = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / color transform
            bits = br.read(3) + 2
            sw = (xsize + (1 << bits) - 1) >> bits
            sh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, sw, sh, allow_meta=False)
            transforms.append((ttype, xsize, bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, xsize))
        else:  # color indexing
            n_colors = br.read(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            palette = []
            prev = 0
            for d in deltas:
                prev = _add_px(prev, d)
                palette.append(prev)
            transforms.append((3, xsize, palette))
            bits = _palette_width_bits(n_colors)
            xsize = (xsize + (1 << bits) - 1) >> bits

    pixels = _decode_entropy_image(br, xsize, h, allow_meta=True)

    for tf in reversed(transforms):
        if tf[0] == 3:
            # expand packed indices back to the pre-reduction width tf[1]
            pixels = _inv_color_indexing(pixels, tf[1], h, tf[2])
        elif tf[0] == 2:
            _inv_subtract_green(pixels)
        elif tf[0] == 1:
            _inv_color_transform(pixels, tf[1], h, tf[2], tf[3])
        else:
            _inv_predictor(pixels, tf[1], h, tf[2], tf[3])

    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    return rgb


# ---------------------------------------------------------------------------
# encoder (spec-valid literal-only subset)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Optimal length-limited code lengths via package-merge — Kraft
    equality guaranteed, lengths ≤ max_len (the VP8L 15-bit limit)."""
    items = sorted((f, s) for s, f in enumerate(freqs) if f > 0)
    out = [0] * len(freqs)
    if not items:
        return out
    if len(items) == 1:
        out[items[0][1]] = 1
        return out
    if len(items) > (1 << max_len):
        raise ValueError("webp: alphabet too large for the length limit")
    level = [(f, (s,)) for f, s in items]
    merged = list(level)
    for _ in range(max_len - 1):
        packages = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(level + packages)
    for _, syms in merged[: 2 * len(items) - 2]:
        for s in syms:
            out[s] += 1
    return out


def _write_prefix_code(
    bw: BitWriter, lengths: list[int]
) -> tuple[list[int], list[int]]:
    """Emit one <prefix code> for ``lengths``; returns (codes,
    wire_lengths). A single-symbol code costs 0 bits per symbol on the
    wire, so its wire_lengths are all zero even though the declared
    length is 1."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] >= 2:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        else:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        codes = [0] * len(lengths)
        wire = [0] * len(lengths)
        if len(nz) == 2:
            codes[nz[1]] = 1
            wire[nz[0]] = wire[nz[1]] = 1
        return codes, wire

    bw.write(0, 1)  # normal code
    # code-length code over symbols 0..15 (no repeat codes in this encoder)
    cl_freq = [0] * 19
    for l in lengths:
        cl_freq[l] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    bw.write(15, 4)  # num_code_lengths = 19
    for sym in K_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol shortcut: emit every symbol's length
    cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        bw.write_code(cl_codes[l], cl_lengths[l])
    return _canonical_codes(lengths), list(lengths)


def webp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → WebP/VP8L bytes (lossless, literal-only:
    no transforms, no cache, one prefix group — spec-valid, deterministic)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("webp: expected (h, w, 3) RGB")
    h, w, _ = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("webp: dims out of the 14-bit VP8L range")

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha unused
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix groups

    r = px[:, :, 0].ravel()
    g = px[:, :, 1].ravel()
    b = px[:, :, 2].ravel()

    g_freq = np.bincount(g, minlength=256 + 24).tolist()
    r_freq = np.bincount(r, minlength=256).tolist()
    b_freq = np.bincount(b, minlength=256).tolist()
    a_freq = [0] * 256
    a_freq[255] = len(r)
    d_freq = [1] + [0] * 39  # never used; 1-symbol simple code

    g_len = _huffman_lengths(g_freq)
    r_len = _huffman_lengths(r_freq)
    b_len = _huffman_lengths(b_freq)
    a_len = _huffman_lengths(a_freq)
    d_len = _huffman_lengths(d_freq)

    g_codes, g_wire = _write_prefix_code(bw, g_len)
    r_codes, r_wire = _write_prefix_code(bw, r_len)
    b_codes, b_wire = _write_prefix_code(bw, b_len)
    a_codes, a_wire = _write_prefix_code(bw, a_len)
    _write_prefix_code(bw, d_len)

    # literals: green, red, blue, alpha per pixel (scan order)
    a_code, a_bits = a_codes[255], a_wire[255]
    for i in range(len(r)):
        gv, rv, bv = int(g[i]), int(r[i]), int(b[i])
        bw.write_code(g_codes[gv], g_wire[gv])
        bw.write_code(r_codes[rv], r_wire[rv])
        bw.write_code(b_codes[bv], b_wire[bv])
        bw.write_code(a_code, a_bits)

    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
