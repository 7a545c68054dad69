"""GIF87a codec (functions/gifkit.py): palette + LZW round-trips, the
decoder-synchronized width-growth boundaries, table reset at 4096 entries,
the cScSc LZW case, external-GIF decode, and the crawl lane wiring."""

import numpy as np
import pytest

from europarl_crawler_spark.functions import gifkit, imaging


def test_roundtrip_random_small_tiles():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (2, 3, 3), (8, 8, 3), (16, 16, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(gifkit.gif_decode(gifkit.gif_encode(px)), px)


def test_roundtrip_via_imaging_dispatch():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    body = imaging.encode(px, "gif")
    assert body[:6] == b"GIF87a"
    assert np.array_equal(imaging.decode(body, 16, 16, "gif"), px)
    assert "gif" in imaging.FORMATS and "gif" in imaging.LOSSLESS


def test_lzw_compresses_runs():
    px = np.zeros((64, 64, 3), dtype=np.uint8)
    px[::2, :, 0] = 255
    body = gifkit.gif_encode(px)
    assert np.array_equal(gifkit.gif_decode(body), px)
    assert len(body) < 64 * 64 * 3 // 10  # dictionary coding actually bites


def test_table_reset_at_4096_entries():
    # 256-color random indices over 128×128 = 16384 px forces LZW growth
    # through every width up to 12 bits and at least one CLEAR reset
    rng = np.random.default_rng(3)
    pal = np.unique(rng.integers(0, 256, size=(300, 3), dtype=np.uint8), axis=0)
    idx = rng.integers(0, min(len(pal), 256), size=128 * 128)
    px = pal[: min(len(pal), 256)][idx].reshape(128, 128, 3)
    assert np.array_equal(gifkit.gif_decode(gifkit.gif_encode(px)), px)


def test_width_growth_boundary_512():
    # ~600 distinct-entry stream crosses the 9→10-bit boundary; a wrong
    # (1<<width) vs (1<<width)+1 convention desynchronizes right here
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, size=2048)
    mcs = 8
    dec = gifkit.lzw_decode(gifkit.lzw_encode(idx, mcs), mcs, len(idx))
    assert np.array_equal(dec, idx)


def test_cscsc_case():
    # 'ababab...' produces code == next_code on decode
    idx = np.array([0, 1] * 32, dtype=np.int32)
    dec = gifkit.lzw_decode(gifkit.lzw_encode(idx, 2), 2, len(idx))
    assert np.array_equal(dec, idx)
    px = np.array([[0, 0, 0], [255, 255, 255]] * 8, dtype=np.uint8).reshape(1, 16, 3)
    assert np.array_equal(gifkit.gif_decode(gifkit.gif_encode(px)), px)


def test_single_pixel_and_single_color():
    assert np.array_equal(
        gifkit.gif_decode(gifkit.gif_encode(np.full((1, 1, 3), 9, np.uint8))),
        np.full((1, 1, 3), 9, np.uint8),
    )
    flat = np.full((16, 16, 3), 200, np.uint8)
    assert np.array_equal(gifkit.gif_decode(gifkit.gif_encode(flat)), flat)


def test_palette_overflow_raises():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="palette overflow"):
        gifkit.gif_encode(px)


def test_decodes_external_gif89a_with_extension_block():
    # the canonical 43-byte 1×1 white GIF89a (GCE extension + 2-byte LZW
    # body) — produced by other encoders, not ours: decoder generality
    tiny = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"\x21\xf9\x04\x01\x00\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    px = gifkit.gif_decode(tiny)
    assert px.shape == (1, 1, 3) and px[0, 0].tolist() == [255, 255, 255]


def test_exact_palette_deterministic_order():
    px = np.array(
        [[[5, 5, 5], [1, 2, 3]], [[1, 2, 3], [0, 0, 0]]], dtype=np.uint8
    )
    pal, idx = gifkit.exact_palette(px)
    assert pal.tolist() == [[0, 0, 0], [1, 2, 3], [5, 5, 5]]
    assert idx.tolist() == [2, 1, 1, 0]


def test_synthetic_web_serves_gif(spark):
    """The html lane's ≤256-px slice serves real GIF bytes that decode."""
    from datetime import date

    from europarl_crawler_spark.sources.synthetic import (
        session_days_df,
        simulated_web,
    )

    days = session_days_df(spark, start=date(2019, 7, 2), n_days=25)
    web = simulated_web(spark, days)
    rows = web.filter("fmt = 'gif'").select("bytes", "w", "h").limit(5).collect()
    assert rows, "no gif rows served — lane not exercised"
    for r in rows:
        assert r.w * r.h <= 256
        px = imaging.decode(bytes(r.bytes), r.w, r.h, "gif")
        assert px.shape == (r.h, r.w, 3)


def test_interlaced_gif_decodes_to_display_order():
    """Hand-build an interlaced stream: rows stored in GIF89a Appendix-E
    pass order with the interlace flag set must decode back to display
    order (externally-produced interlaced GIFs are common on the web)."""
    rng = np.random.default_rng(11)
    h, w = 13, 7  # odd sizes exercise every pass boundary
    px = (rng.integers(0, 8, (h, w, 3)) * 32).astype(np.uint8)
    order = np.concatenate(
        [np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    body = bytearray(gifkit.gif_encode(px[order]))
    n_gct = 1 << ((body[10] & 0x07) + 1)
    desc = 13 + 3 * n_gct
    assert body[desc] == 0x2C
    body[desc + 9] |= 0x40  # set the interlace flag
    assert np.array_equal(gifkit.gif_decode(bytes(body)), px)
