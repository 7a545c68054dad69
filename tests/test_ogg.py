"""Ogg container: page framing, CRC, lacing, Opus header, probe dispatch."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import oggkit


@pytest.mark.parametrize("n", [1, 4, 9, 25, 100])
def test_synthesize_probe_roundtrip(n):
    p = oggkit.ogg_probe(oggkit.ogg_opus_synthesize(n, seed=n))
    assert p["n_packets"] == n
    assert p["n_pages"] == 2 + math.ceil(n / 4)
    assert p["samplerate"] == 48000 and p["channels"] == 1
    assert p["duration_ms"] == max(n * 960 - 312, 0) * 1000 // 48000


def test_ogg_crc_is_not_zlib():
    import zlib

    data = b"OggS test vector"
    assert oggkit.ogg_crc(data) != zlib.crc32(data)
    assert oggkit.ogg_crc(b"") == 0


def test_stereo_and_rate_fields():
    p = oggkit.ogg_probe(
        oggkit.ogg_opus_synthesize(6, channels=2, input_rate=44100)
    )
    assert p["channels"] == 2 and p["samplerate"] == 44100


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda b: b"XggS" + b[4:], "capture"),
        (lambda b: b[:-1], "truncated"),
        (lambda b: b[:-3] + bytes((b[-3] ^ 1,)) + b[-2:], "CRC"),
        (lambda b: b[:4] + b"\x01" + b[5:], "version"),
    ],
)
def test_malformed_raises(mangle, msg):
    blob = oggkit.ogg_opus_synthesize(8, seed=2)
    with pytest.raises(ValueError, match=msg):
        oggkit.ogg_probe(mangle(blob))


def test_non_opus_first_packet_raises():
    page = oggkit._page([b"NotOpusHdr"], 1, 0, 0, 0x02)
    with pytest.raises(ValueError, match="OpusHead"):
        oggkit.ogg_probe(page)


def test_large_packet_lacing():
    """A packet > 255 bytes spans multiple 255 lacing values and one
    terminator — the probe must count it as ONE packet."""
    head = oggkit._page([oggkit.opus_head()], 9, 0, 0, 0x02)
    tags = oggkit._page(
        [b"OpusTags" + struct.pack("<I", 1) + b"x" + struct.pack("<I", 0)],
        9, 1, 0, 0,
    )
    big = oggkit._page([bytes(700)], 9, 2, 960, 0x04)
    p = oggkit.ogg_probe(head + tags + big)
    assert p["n_packets"] == 1


def test_media_probe_dispatch_ogg_and_images(spark):
    import pandas as pd

    from europarl_crawler_spark.functions import imaging
    from europarl_crawler_spark.operators.multimodal import media_probe

    px = np.random.RandomState(3).randint(0, 256, (12, 16, 3)).astype(np.uint8)
    rows = [
        ("1", oggkit.ogg_opus_synthesize(7, seed=1), "ogg"),
        ("2", imaging.encode(px, "png"), "png"),
        ("3", imaging.encode(px, "qoi"), "qoi"),
        ("4", b"garbage bytes", "ogg"),  # malformed -> ok=false row
        ("5", imaging.encode(px, "png"), "qoi"),  # lying fmt -> ok=false
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = {int(r["media_id"]): r for r in media_probe(df).collect()}
    assert got[1]["kind"] == "audio" and got[1]["n_frames"] == 7
    assert (got[2]["kind"], got[2]["w"], got[2]["h"]) == ("image", 16, 12)
    assert got[3]["w"] == 16 and got[3]["ok"]
    assert not got[4]["ok"]
    assert not got[5]["ok"]
