"""FLAC codec (functions/flackit.py, RFC 9639): exact round trips through
the encoder, hand-built bitstreams for every decoder-only path (LPC,
mid/side, right/side, rice escape/5-bit/partitions, wasted bits, VERBATIM),
and the malformed-input contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import flackit


# ---------------------------------------------------------------------------
# encoder round trips
# ---------------------------------------------------------------------------


def test_mono_roundtrip_exact_and_compressed():
    rng = np.random.default_rng(7)
    t = np.arange(10000)
    x = (3000 * np.sin(t / 50) + rng.integers(-200, 200, len(t))).astype(np.int16)
    b = flackit.flac_encode(x, 16000)
    dec, sr = flackit.flac_decode(b)
    assert np.array_equal(dec, x) and sr == 16000
    assert len(b) < 2 * len(x)  # genuinely smaller than raw PCM


def test_stereo_left_side_roundtrip():
    t = np.arange(9000)
    l = (2000 * np.sin(t / 30)).astype(np.int16)
    r = (l + np.random.default_rng(1).integers(-50, 50, len(t))).astype(np.int16)
    st = np.stack([l, r], axis=1).astype(np.int16)
    b = flackit.flac_encode(st, 44100)
    dec, sr = flackit.flac_decode(b)
    assert np.array_equal(dec, st) and sr == 44100
    # correlated channels must actually pick the decorrelated assignment
    assert len(b) < 2 * st.size * 0.6


def test_constant_and_extreme_samples():
    c = np.full(5000, -123, dtype=np.int16)
    assert np.array_equal(flackit.flac_decode(flackit.flac_encode(c))[0], c)
    e = np.array([-32768, 32767, 0, -1, 1] * 100, dtype=np.int16)
    assert np.array_equal(flackit.flac_decode(flackit.flac_encode(e))[0], e)


def test_multi_frame_and_partial_tail_block():
    x = np.random.default_rng(3).integers(-500, 500, flackit.BLOCK + 777).astype(
        np.int16
    )
    dec, _ = flackit.flac_decode(flackit.flac_encode(x))
    assert np.array_equal(dec, x)


# ---------------------------------------------------------------------------
# hand-built streams: decoder-only paths
# ---------------------------------------------------------------------------


def _make_stream(subframe_writers, bs, nch=1, assign=None, rate=16000):
    si = flackit._BitWriter()
    si.write(bs, 16), si.write(bs, 16), si.write(0, 24), si.write(0, 24)
    si.write(rate, 20), si.write(nch - 1, 3), si.write(15, 5), si.write(0, 36)
    body = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = flackit._BitWriter()
    hdr.write(0b11111111111110, 14), hdr.write(0, 1), hdr.write(0, 1)
    hdr.write(7, 4), hdr.write(0, 4)
    hdr.write(assign if assign is not None else nch - 1, 4)
    hdr.write(0b100, 3), hdr.write(0, 1)
    hb = bytearray(hdr.bytes()) + flackit._utf8_number(0) + struct.pack(">H", bs - 1)
    hb.append(flackit.crc8(bytes(hb)))
    fw = flackit._BitWriter()
    for w in subframe_writers:
        w(fw)
    fw.align()
    frame = bytes(hb) + fw.bytes()
    out += frame + struct.pack(">H", flackit.crc16(frame))
    return bytes(out)


def _rice_residual(fw, res, p, method=0, po=0):
    fw.write(method, 2)
    fw.write(po, 4)
    pbits = 4 if method == 0 else 5
    n = len(res)
    parts = 1 << po
    per = n // parts  # order-0 subframes only in these tests
    for part in range(parts):
        fw.write(p, pbits)
        for v in res[part * per : (part + 1) * per]:
            u = (v << 1) if v >= 0 else ((-v << 1) - 1)
            fw.write_unary(u >> p)
            fw.write(u & ((1 << p) - 1), p)


def test_lpc_subframe():
    # LPC order 2, coefs [2, -1], shift 0 == the fixed-2 predictor
    x = (100 * np.sin(np.arange(64) / 5)).astype(np.int64)
    res = np.diff(np.diff(x))

    def sub(fw):
        fw.write(0, 1), fw.write(32 + 1, 6), fw.write(0, 1)  # LPC order 2
        fw.write(int(x[0]) & 0xFFFF, 16), fw.write(int(x[1]) & 0xFFFF, 16)
        fw.write(4, 4)  # precision 5 bits
        fw.write(0, 5)  # shift 0
        fw.write(2 & 0x1F, 5), fw.write(-1 & 0x1F, 5)
        _rice_residual(fw, list(res), 4)

    dec, _ = flackit.flac_decode(_make_stream([sub], 64))
    assert np.array_equal(dec, x.astype(np.int16))


def _order0_sub(samples, p=4, method=0, po=0, wasted=0):
    def sub(fw):
        fw.write(0, 1), fw.write(8, 6)  # FIXED order 0
        if wasted:
            fw.write(1, 1)
            fw.write_unary(wasted - 1)
        else:
            fw.write(0, 1)
        _rice_residual(fw, [s >> wasted for s in samples], p, method, po)

    return sub


def test_mid_side_and_right_side():
    l = np.array([100, -200, 300, -400] * 8, dtype=np.int64)
    r = np.array([90, -190, 310, -390] * 8, dtype=np.int64)
    mid, side = (l + r) >> 1, l - r
    dec, _ = flackit.flac_decode(
        _make_stream(
            [_order0_sub(list(mid)), _order0_sub(list(side))], 32, nch=2, assign=10
        )
    )
    assert np.array_equal(dec, np.stack([l, r], axis=1).astype(np.int16))
    dec2, _ = flackit.flac_decode(
        _make_stream(
            [_order0_sub(list(side)), _order0_sub(list(r))], 32, nch=2, assign=9
        )
    )
    assert np.array_equal(dec2, np.stack([l, r], axis=1).astype(np.int16))


def test_rice_escape_and_5bit_method_and_partitions():
    x = list(range(-16, 16))  # 32 samples

    def escape_sub(fw):
        fw.write(0, 1), fw.write(8, 6), fw.write(0, 1)
        fw.write(0, 2)  # method 0
        fw.write(0, 4)  # po 0
        fw.write(15, 4)  # escape
        fw.write(8, 5)  # raw 8-bit signed residuals
        for v in x:
            fw.write(v & 0xFF, 8)

    dec, _ = flackit.flac_decode(_make_stream([escape_sub], 32))
    assert np.array_equal(dec, np.array(x, dtype=np.int16))

    dec2, _ = flackit.flac_decode(_make_stream([_order0_sub(x, p=3, method=1)], 32))
    assert np.array_equal(dec2, np.array(x, dtype=np.int16))

    dec3, _ = flackit.flac_decode(_make_stream([_order0_sub(x, p=4, po=2)], 32))
    assert np.array_equal(dec3, np.array(x, dtype=np.int16))


def test_wasted_bits_and_verbatim():
    x = [v * 4 for v in range(-8, 8)]  # all multiples of 4 → 2 wasted bits
    dec, _ = flackit.flac_decode(_make_stream([_order0_sub(x, p=4, wasted=2)], 16))
    assert np.array_equal(dec, np.array(x, dtype=np.int16))

    def verb(fw):
        fw.write(0, 1), fw.write(1, 6), fw.write(0, 1)
        for v in x:
            fw.write(v & 0xFFFF, 16)

    dec2, _ = flackit.flac_decode(_make_stream([verb], 16))
    assert np.array_equal(dec2, np.array(x, dtype=np.int16))


# ---------------------------------------------------------------------------
# malformed-input contract
# ---------------------------------------------------------------------------


def test_malformed_inputs_raise_valueerror():
    good = flackit.flac_encode(np.arange(-100, 100, dtype=np.int16))
    with pytest.raises(ValueError):
        flackit.flac_decode(b"NOPE" + good[4:])
    with pytest.raises(ValueError):
        flackit.flac_decode(good[: len(good) // 2])  # truncation
    bad = bytearray(good)
    bad[-3] ^= 0xFF  # corrupt inside the last frame → CRC-16 mismatch
    with pytest.raises(ValueError):
        flackit.flac_decode(bytes(bad))
    hdr = bytearray(good)
    hdr[46] ^= 0x01  # flip a frame-header bit → CRC-8 or sync failure
    with pytest.raises(ValueError):
        flackit.flac_decode(bytes(hdr))


def test_crc_tables_pin():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 known-answer checks
    assert flackit.crc8(b"123456789") == 0xF4
    assert flackit.crc16(b"123456789") == 0xFEE8


def test_probe_and_audio_features_dispatch(spark):
    from europarl_crawler_spark.operators import multimodal

    x = (1000 * np.sin(np.arange(6000) / 40)).astype(np.int16)
    b = flackit.flac_encode(x, 22050)
    p = flackit.flac_probe(b)
    assert p == {
        "samplerate": 22050, "channels": 1, "bits_per_sample": 16,
        "n_samples": 6000, "duration_ms": 6000 * 1000 // 22050,
    }
    with pytest.raises(ValueError):
        flackit.flac_probe(b[:10])

    df = spark.createDataFrame(
        [("a1", bytearray(b), "flac"), ("a2", bytearray(b"junk"), "flac")],
        "audio_id string, bytes binary, fmt string",
    )
    rows = {r.audio_id: r for r in multimodal.audio_features(df).collect()}
    assert rows["a1"].n_samples == 6000 and rows["a1"].framerate == 22050
    assert rows["a1"].peak == int(np.abs(x).max())
    assert rows["a2"].n_samples is None  # malformed keeps its row, null stats
