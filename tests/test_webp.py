"""WebP VP8L codec (functions/webpkit.py): encoder round-trips, and
decoder generality via hand-crafted bitstreams exercising the spec
features the literal-only encoder never emits — LZ77 backward refs with
2D distance codes, color cache, positional simple codes, all four
transforms, and meta prefix groups."""

import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging, webpkit
from europarl_crawler_spark.functions.webpkit import (
    BitWriter,
    K_CODE_TO_PLANE,
    _cache_key,
    _write_prefix_code,
    webp_decode,
    webp_encode,
)


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_random_tiles():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (2, 3, 3), (8, 8, 3), (16, 16, 3), (7, 13, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(webp_decode(webp_encode(px)), px)


def test_entropy_coding_compresses():
    flat = np.full((32, 32, 3), 77, np.uint8)
    body = webp_encode(flat)
    assert np.array_equal(webp_decode(body), flat)
    assert len(body) < flat.nbytes // 20  # prefix coding actually bites


def test_imaging_dispatch():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    body = imaging.encode(px, "webp")
    assert body[:4] == b"RIFF" and body[8:12] == b"WEBP"
    assert np.array_equal(imaging.decode(body, 16, 16, "webp"), px)
    assert "webp" in imaging.FORMATS and "webp" in imaging.LOSSLESS


def test_distance_map_table_shape():
    # the 120-entry 2D map is a permutation of all (y<<4|x+8) codes except
    # the eight y=0, x>=0 entries (those distances are trivially linear),
    # ordered by non-decreasing euclidean offset (spec dist_map)
    assert len(K_CODE_TO_PLANE) == 120
    assert len(set(K_CODE_TO_PLANE)) == 120
    assert set(K_CODE_TO_PLANE) == set(range(128)) - set(range(0x08, 0x10))
    d2 = [((c & 0xF) - 8) ** 2 + (c >> 4) ** 2 for c in K_CODE_TO_PLANE]
    assert all(a <= b for a, b in zip(d2, d2[1:]))


# ---------------------------------------------------------------------------
# hand-crafted streams: decoder features beyond the encoder subset
# ---------------------------------------------------------------------------


def _container(bw: BitWriter) -> bytes:
    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple(bw: BitWriter, symbols: list[int]) -> None:
    """<simple prefix code>: 1-2 POSITIONAL symbols."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    if symbols[0] >= 2:
        bw.write(1, 1)
        bw.write(symbols[0], 8)
    else:
        bw.write(0, 1)
        bw.write(symbols[0], 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _codes(bw: BitWriter, freq_sets: list[tuple[list[int], int]]) -> list:
    """Write prefix codes for (frequencies, alphabet) pairs; return emit
    fns mapping symbol → (code, wire_length)."""
    from europarl_crawler_spark.functions.webpkit import _huffman_lengths

    out = []
    for freqs, alphabet in freq_sets:
        full = list(freqs) + [0] * (alphabet - len(freqs))
        codes, wire = _write_prefix_code(bw, _huffman_lengths(full))
        out.append(lambda s, c=codes, w=wire: (c[s], w[s]))
    return out


def test_lz77_backward_reference_2d_distance():
    # 4×1 image of one repeated pixel: literal + length-3 copy at distance 1
    # (2D plane code index 1 → (dx=-1, dy=0) → clamped distance 1)
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green alphabet 280: symbols {10 (literal), 258 (length code 2 → 3)}
    g = [0] * 280
    g[10] = g[258] = 1
    (g_emit,) = _codes(bw, [(g, 280)])
    _simple(bw, [20])  # red
    _simple(bw, [30])  # blue
    _simple(bw, [255])  # alpha
    _simple(bw, [1])  # distance: prefix code 1 → value 2 → plane idx 2? no:
    # dist symbol 1 → _prefix_value(1) = 2 → K_CODE_TO_PLANE[1] = 0x07
    # → (x=-1, y=0) → distance max(1, -1) = 1
    c, l = g_emit(10)
    bw.write_code(c, l)  # literal green=10 (r/b/a cost 0 bits)
    c, l = g_emit(258)
    bw.write_code(c, l)  # length code 2 → length 3, no extra bits
    px = webp_decode(_container(bw))
    assert px.shape == (1, 4, 3)
    assert (px == [20, 10, 30]).all()


def test_color_cache_hit():
    # pixels [A, B, A]: third pixel served from the 2-entry color cache
    bw = BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)  # no transform
    bw.write(1, 1)  # cache present
    bw.write(1, 4)  # cache_bits = 1
    bw.write(0, 1)  # no meta
    A = (255 << 24) | (9 << 16) | (7 << 8) | 5
    B = (255 << 24) | (1 << 16) | (2 << 8) | 3
    key_a = _cache_key(A, 1)
    key_b = _cache_key(B, 1)
    assert key_a != key_b  # chosen so both cache slots stay live
    g = [0] * (280 + 2)
    g[7] = g[2] = g[280 + key_a] = 1  # greens + cache symbol: need lens 1,2,2
    g[7] = 1
    g[2] = 2
    g[280 + key_a] = 2
    sets = _codes(bw, [(g, 282)])
    (g_emit,) = sets
    r = [0] * 256
    r[9] = r[1] = 1
    (r_emit,) = _codes(bw, [(r, 256)])
    b = [0] * 256
    b[5] = b[3] = 1
    (b_emit,) = _codes(bw, [(b, 256)])
    _simple(bw, [255])  # alpha
    _simple(bw, [0])  # distance (unused)
    for gv, rv, bv in [(7, 9, 5), (2, 1, 3)]:
        c, l = g_emit(gv)
        bw.write_code(c, l)
        c, l = r_emit(rv)
        bw.write_code(c, l)
        c, l = b_emit(bv)
        bw.write_code(c, l)
    c, l = g_emit(280 + key_a)  # cache hit for A
    bw.write_code(c, l)
    px = webp_decode(_container(bw))
    assert (px == [[[9, 7, 5], [1, 2, 3], [9, 7, 5]]]).all()


def test_positional_simple_code_order():
    # 2-symbol simple code with sym0 > sym1: code 0 must map to the FIRST
    # WRITTEN symbol (positional), not the numerically smaller one
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _simple(bw, [9, 3])  # green: bit 0 → 9, bit 1 → 3
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [255])
    _simple(bw, [0])
    bw.write(0, 1)  # green bit 0 → 9
    bw.write(1, 1)  # green bit 1 → 3
    px = webp_decode(_container(bw))
    assert [p[1] for p in px[0]] == [9, 3]


def test_subtract_green_transform():
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # target pixels (r,g,b): (100, 40, 50) and (10, 200, 30)
    # stored residuals: r-g, g, b-g (mod 256)
    stored = [((100 - 40) & 255, 40, (50 - 40) & 255),
              ((10 - 200) & 255, 200, (30 - 200) & 255)]
    g = [0] * 280
    r = [0] * 256
    b = [0] * 256
    for rv, gv, bv in stored:
        g[gv] = r[rv] = b[bv] = 1
    (g_emit,) = _codes(bw, [(g, 280)])
    (r_emit,) = _codes(bw, [(r, 256)])
    (b_emit,) = _codes(bw, [(b, 256)])
    _simple(bw, [255])
    _simple(bw, [0])
    for rv, gv, bv in stored:
        for emit, v in ((g_emit, gv), (r_emit, rv), (b_emit, bv)):
            c, l = emit(v)
            bw.write_code(c, l)
    px = webp_decode(_container(bw))
    assert (px == [[[100, 40, 50], [10, 200, 30]]]).all()


def test_predictor_transform_mode_T():
    # 4×2 image; predictor sub-image = one block with mode 2 (Top).
    # row 1 duplicates row 0, so its residuals (beyond the forced edges)
    # are all zero.
    row0 = [(11, 22, 33), (44, 55, 66), (77, 88, 99), (120, 130, 140)]
    bw = BitWriter()
    _header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 → 4×4 blocks → 1×1 sub-image
    # sub-image (entropy-coded, no meta): literal green = mode 2
    bw.write(0, 1)  # sub-image: no cache
    _simple(bw, [2])  # green = mode
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [0])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # main: no cache
    bw.write(0, 1)  # main: no meta
    # residuals: (0,0) vs black (a=255→res 0, rgb as-is); row0 x>0 vs L;
    # row1 vs T → all-zero rgb residuals (alpha residual 0 everywhere)
    res = [row0[0]]
    for x in range(1, 4):
        res.append(tuple((row0[x][c] - row0[x - 1][c]) & 255 for c in range(3)))
    res += [(0, 0, 0)] * 4
    g = [0] * 280
    r = [0] * 256
    b = [0] * 256
    a = [0] * 256
    a[0] = 1
    for rv, gv, bv in res:
        g[gv] = r[rv] = b[bv] = 1
    (g_emit,) = _codes(bw, [(g, 280)])
    (r_emit,) = _codes(bw, [(r, 256)])
    (b_emit,) = _codes(bw, [(b, 256)])
    _simple(bw, [0])  # alpha residual 0
    _simple(bw, [0])  # distance
    for rv, gv, bv in res:
        for emit, v in ((g_emit, gv), (r_emit, rv), (b_emit, bv)):
            c, l = emit(v)
            bw.write_code(c, l)
    px = webp_decode(_container(bw))
    expect = np.array([row0, row0], dtype=np.uint8)
    assert np.array_equal(px, expect), f"{px.tolist()}"


def test_color_transform():
    # one block, green_to_red = 16: delta = (16 * signed(g)) >> 5
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(0, 3)  # size_bits = 2 → 1×1 sub-image
    bw.write(0, 1)  # sub: no cache
    _simple(bw, [0])  # sub green = green_to_blue = 0
    _simple(bw, [0])  # sub red = red_to_blue = 0
    _simple(bw, [16])  # sub blue = green_to_red = 16
    _simple(bw, [0])
    _simple(bw, [0])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    # target (r,g,b) = (100, 64, 77); delta_r = (16*64)>>5 = 32
    # stored r = (100-32) & 255 = 68
    _simple(bw, [64])  # green
    _simple(bw, [68])  # red
    _simple(bw, [77])  # blue
    _simple(bw, [255])
    _simple(bw, [0])
    px = webp_decode(_container(bw))
    assert px[0, 0].tolist() == [100, 64, 77]


def test_color_indexing_with_bundling():
    # 4-color palette → 2 bits/index, 4 indices per packed pixel
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(3, 8)  # n_colors - 1
    # palette image (4×1): componentwise deltas, alpha 255
    argb = [(255 << 24) | (r << 16) | (g << 8) | b for r, g, b in colors]
    deltas = []
    prev = 0
    for c in argb:
        deltas.append(
            tuple((((c >> s) & 255) - ((prev >> s) & 255)) & 255
                  for s in (24, 16, 8, 0))
        )
        prev = c
    bw.write(0, 1)  # palette image: no cache
    g = [0] * 280
    r = [0] * 256
    b = [0] * 256
    a = [0] * 256
    for av, rv, gv, bv in deltas:
        a[av] = r[rv] = g[gv] = b[bv] = 1
    (g_emit,) = _codes(bw, [(g, 280)])
    (r_emit,) = _codes(bw, [(r, 256)])
    (b_emit,) = _codes(bw, [(b, 256)])
    (a_emit,) = _codes(bw, [(a, 256)])
    _simple(bw, [0])
    for av, rv, gv, bv in deltas:
        for emit, v in ((g_emit, gv), (r_emit, rv), (b_emit, bv), (a_emit, av)):
            c, l = emit(v)
            bw.write_code(c, l)
    bw.write(0, 1)  # no more transforms
    # main image: packed width ceil(8/4) = 2, greens hold 4×2-bit indices
    packed = [
        idx[0] | idx[1] << 2 | idx[2] << 4 | idx[3] << 6,
        idx[4] | idx[5] << 2 | idx[6] << 4 | idx[7] << 6,
    ]
    bw.write(0, 1)  # main: no cache
    bw.write(0, 1)  # main: no meta
    gm = [0] * 280
    for p in packed:
        gm[p] = 1
    (gm_emit,) = _codes(bw, [(gm, 280)])
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [255])
    _simple(bw, [0])
    for p in packed:
        c, l = gm_emit(p)
        bw.write_code(c, l)
    px = webp_decode(_container(bw))
    expect = np.array([[colors[i] for i in idx]], dtype=np.uint8)
    assert np.array_equal(px, expect)


def test_meta_prefix_groups():
    # 8×1 image, meta_bits=2 → 2 meta blocks → two prefix groups with
    # different literal palettes
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # meta_bits = 2 → blocks of 4 → meta image 2×1
    # meta image (entropy-coded, no meta): greens 0 and 1 = group indices
    bw.write(0, 1)  # meta image: no cache
    _simple(bw, [0, 1])  # green: positional [0, 1]
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [0])
    _simple(bw, [0])
    bw.write(0, 1)  # meta pixel 0 → group 0
    bw.write(1, 1)  # meta pixel 1 → group 1
    # group 0 codes then group 1 codes
    _simple(bw, [10])
    _simple(bw, [20])
    _simple(bw, [30])
    _simple(bw, [255])
    _simple(bw, [0])
    _simple(bw, [40])
    _simple(bw, [50])
    _simple(bw, [60])
    _simple(bw, [255])
    _simple(bw, [0])
    # all 8 pixels cost 0 bits (every code single-symbol)
    px = webp_decode(_container(bw))
    assert (px[0, :4] == [20, 10, 30]).all()
    assert (px[0, 4:] == [50, 40, 60]).all()


def test_rejects_bad_input():
    with pytest.raises(ValueError, match="RIFF"):
        webp_decode(b"nope" * 8)
    with pytest.raises(ValueError, match="VP8L"):
        webp_decode(b"RIFF\x04\x00\x00\x00WEBP")


def test_truncation_always_valueerror():
    # a web-scale extract stage must get a CLEAN rejection for any
    # truncated download — never an IndexError or a hang
    rng = np.random.default_rng(99)
    body = webp_encode(rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8))
    for cut in range(len(body)):
        with pytest.raises(ValueError):
            webp_decode(body[:cut])


def test_synthetic_web_serves_webp(spark):
    """The html lane serves real VP8L bytes that decode to exact pixels."""
    from datetime import date

    from europarl_crawler_spark.sources.synthetic import (
        session_days_df,
        simulated_web,
    )

    days = session_days_df(spark, start=date(2019, 7, 2), n_days=25)
    web = simulated_web(spark, days)
    rows = web.filter("fmt = 'webp'").select("bytes", "w", "h").limit(5).collect()
    assert rows, "no webp rows served — lane not exercised"
    for r in rows:
        px = imaging.decode(bytes(r.bytes), r.w, r.h, "webp")
        assert px.shape == (r.h, r.w, 3)
