"""Content sniffing: magic detection across every engine format,
header-only dims, lying-extension robustness, malformed headers."""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging, sniff


def _px(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("fmt", sniff.IMAGE_FORMATS)
def test_image_sniff_and_dims(fmt):
    for h, w in [(8, 8), (12, 16)]:
        px = _px(h, w, seed=h + w)
        if fmt == "gif":
            px = (px // 32) * 32
        body = imaging.encode(px, fmt)
        assert sniff.sniff_format(body) == fmt
        assert sniff.image_dims(body) == (fmt, w, h)


def test_audio_video_archive_sniffs():
    from europarl_crawler_spark.functions import flackit, mp3kit, mp4kit
    from europarl_crawler_spark.operators.multimodal import wav_encode

    s = np.zeros(64, np.int16)
    assert sniff.sniff_format(wav_encode(s, 8000)) == "wav"
    assert sniff.sniff_format(flackit.flac_encode(s, 8000)) == "flac"
    assert sniff.sniff_format(
        mp3kit.mp3_synthesize(3, 128, 44100, mono=True, seed=1)
    ) == "mp3"
    import gzip

    assert sniff.sniff_format(gzip.compress(b"x")) == "gzip"
    assert sniff.sniff_format(b"<?xml version=\"1.0\"?><a/>") == "xml"
    assert sniff.sniff_format(b"\x00unknown\x01bytes") is None


def test_dims_are_header_only():
    """Truncating every byte past the header must not stop the dims probe —
    proof no pixel decode happens."""
    px = _px(32, 48, seed=3)
    body = imaging.encode(px, "png")
    assert sniff.image_dims(body[:33]) == ("png", 48, 32)  # sig+IHDR only
    body = imaging.encode(px, "qoi")
    assert sniff.image_dims(body[:14]) == ("qoi", 48, 32)
    body = imaging.encode((px // 64) * 64, "gif")  # within the palette cap
    assert sniff.image_dims(body[:13]) == ("gif", 48, 32)


def test_jpeg_sof_walk_skips_leading_segments():
    """The SOF scan must walk past APP/COM/DQT/DHT segments (real files
    lead with several) — use the real encoder output, which does."""
    from europarl_crawler_spark.functions import jpegkit

    body = jpegkit.jpeg_encode(_px(24, 40, seed=5), quality=90)
    assert sniff.image_dims(body) == ("jpeg", 40, 24)


def test_bmp_topdown_height_normalized():
    from europarl_crawler_spark.functions import tiffkit  # noqa: F401

    px = _px(6, 4, seed=7)
    body = bytearray(imaging.encode(px, "bmp"))
    # flip to the top-down variant: negative height at offset 22
    import struct

    (h,) = struct.unpack_from("<i", body, 22)
    struct.pack_into("<i", body, 22, -abs(h))
    assert sniff.image_dims(bytes(body))[2] == 6


def test_non_image_dims_raise():
    with pytest.raises(ValueError):
        sniff.image_dims(b"fLaC\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        sniff.image_dims(b"\xff\xd8\xff" + b"\x00" * 10)  # jpeg, no SOF
