"""EXIF APP1/TIFF metadata invariants (functions/exifkit.py): IFD build →
parse round trip in both byte orders, inline vs offset ASCII values, tag
ordering, JFIF embedding beside COM, and malformed-stream rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import exifkit, jpegkit


def _build(bo="II", desc="Plenary sitting photo — ü", soft="europarl-crawler-spark"):
    return exifkit.exif_build(
        description=desc,
        orientation=6,
        software=soft,
        datetime="2026:08:19 12:00:00",
        pixel_x=640,
        pixel_y=480,
        byte_order=bo,
    )


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    p = exifkit.exif_parse(_build(bo))
    assert p == {
        "byte_order": bo,
        "description": "Plenary sitting photo — ü",
        "orientation": 6,
        "software": "europarl-crawler-spark",
        "datetime": "2026:08:19 12:00:00",
        "pixel_x": 640,
        "pixel_y": 480,
        "n_tags": 7,
    }


def test_inline_ascii_values():
    # NUL-terminated forms of "abc" (4 bytes), "x" (2) and "" (1) all fit
    # the 4-byte value field — the inline path, no data-area offsets
    app1 = exifkit.exif_build("abc", 1, "x", "", 1, 2)
    p = exifkit.exif_parse(app1)
    assert (p["description"], p["software"], p["datetime"]) == ("abc", "x", "")
    assert (p["pixel_x"], p["pixel_y"]) == (1, 2)


def test_ifd_entries_sorted_by_tag():
    # TIFF 6.0 §2 requires ascending tag order; real parsers binary-search
    app1 = _build()
    tiff = app1[len(exifkit.EXIF_HEADER) :]
    (ifd0_off,) = struct.unpack_from("<I", tiff, 4)
    (n,) = struct.unpack_from("<H", tiff, ifd0_off)
    tags = [
        struct.unpack_from("<H", tiff, ifd0_off + 2 + i * 12)[0] for i in range(n)
    ]
    assert tags == sorted(tags)


def test_jpeg_embed_and_extract_beside_com():
    px = np.arange(768, dtype=np.uint8).reshape(16, 16, 3)
    body = jpegkit.jpeg_encode(px, comment="a COM caption", exif=_build("MM"))
    meta = exifkit.jpeg_exif(body)
    assert meta["byte_order"] == "MM" and meta["orientation"] == 6
    assert meta["description"] == "Plenary sitting photo — ü"
    # COM mining and pixel decode are unaffected by the APP1 segment
    assert jpegkit.jpeg_comments(body) == ["a COM caption"]
    assert jpegkit.jpeg_decode(body).shape == (16, 16, 3)


def test_jpeg_without_exif_returns_none():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    assert exifkit.jpeg_exif(jpegkit.jpeg_encode(px)) is None
    # COM-only stream likewise: the walk must not mistake COM for APP1
    assert exifkit.jpeg_exif(jpegkit.jpeg_encode(px, comment="c")) is None


def test_rejects_malformed():
    good = _build()
    with pytest.raises(ValueError, match="byte order"):
        exifkit.exif_parse(exifkit.EXIF_HEADER + b"XX" + good[10:])
    with pytest.raises(ValueError, match="Exif"):
        exifkit.exif_parse(b"NotExif" + good)
    with pytest.raises(ValueError, match="magic"):
        bad = bytearray(good)
        bad[8] = 99  # II magic low byte
        exifkit.exif_parse(bytes(bad))
    with pytest.raises(ValueError):
        exifkit.exif_parse(good[:20])  # truncated IFD
    with pytest.raises(ValueError):
        # value offset pointing past the stream
        bad = bytearray(good)
        # ImageDescription is the first IFD0 entry; its value field sits at
        # tiff[8 + 2 + 8 : 8 + 2 + 12] → app1[6 + 18 : 6 + 22]
        struct.pack_into("<I", bad, len(exifkit.EXIF_HEADER) + 8 + 2 + 8, 1 << 20)
        exifkit.exif_parse(bytes(bad))


def test_build_validates_inputs():
    with pytest.raises(ValueError, match="orientation"):
        exifkit.exif_build("d", 9, "s", "t", 1, 1)
    with pytest.raises(ValueError, match="byte order"):
        exifkit.exif_build("d", 1, "s", "t", 1, 1, byte_order="XX")


# ---- GPS IFD + location scrub ----

def _gps():
    return ("N", [(48, 1), (51, 1), (2999, 100)],
            "E", [(2, 1), (17, 1), (4034, 100)])


def test_gps_roundtrip_both_orders():
    from europarl_crawler_spark.functions import exifkit

    for bo in ("II", "MM"):
        a = exifkit.exif_build("d", 3, "s", "t", 8, 8, byte_order=bo, gps=_gps())
        f = exifkit.exif_parse(a)
        assert f["gps_lat_ref"] == "N"
        assert f["gps_lat"] == [48, 1, 51, 1, 2999, 100]
        assert f["gps_lon_ref"] == "E"
        assert f["gps_lon"] == [2, 1, 17, 1, 4034, 100]
        assert f["n_tags"] == 12


def test_scrub_removes_gps_keeps_whitelist():
    from europarl_crawler_spark.functions import exifkit

    a = exifkit.exif_build(
        "keep me", 5, "sw", "2026:01:01 00:00:00", 32, 16,
        byte_order="MM", gps=_gps(),
    )
    clean, had = exifkit.exif_scrub_gps(a)
    assert had
    f = exifkit.exif_parse(clean)
    assert "gps_lat" not in f and "gps_lat_ref" not in f
    assert f["n_tags"] == 7
    assert (f["description"], f["orientation"], f["software"],
            f["pixel_x"], f["pixel_y"], f["byte_order"]) == (
        "keep me", 5, "sw", 32, 16, "MM")
    # no GPS byte survives anywhere in the scrubbed payload
    import struct
    assert struct.pack(">II", 2999, 100) not in clean
    assert struct.pack("<II", 2999, 100) not in clean


def test_scrub_without_gps_is_identity():
    from europarl_crawler_spark.functions import exifkit

    a = exifkit.exif_build("d", 1, "s", "t", 8, 8, byte_order="II")
    clean, had = exifkit.exif_scrub_gps(a)
    assert not had and clean == a


def test_gps_bad_refs_rejected():
    from europarl_crawler_spark.functions import exifkit
    import pytest as _pt

    with _pt.raises(ValueError):
        exifkit.exif_build("d", 1, "s", "t", 8, 8,
                           gps=("X", [(1, 1)] * 3, "E", [(1, 1)] * 3))
