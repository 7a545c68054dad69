"""Content sniffing: format detection + header-only image dimensions.

On a real crawl the Content-Type header lies constantly (misconfigured
servers, CDNs rewriting, extensions that don't match bytes) — a fetch
stage must type payloads from the BYTES before routing them to a decoder
(the same O(bytes-prefix) stance as media_probe). This module implements
magic-number sniffing across every format the engine decodes, plus
header-only width/height extraction for the image formats (no pixel
decode — dims come from the container header alone, so the probe is O(kB)
regardless of image size).

Reference analog: the reference trusts its URL templates for type
(rules/*.py fix the filetype per rule); a general crawler cannot, and the
serving dispatch (plans/fetch.py / operators/multimodal.py) keys on the
sniffed tag when the transport type is absent or wrong.
"""

from __future__ import annotations

import struct

from .kitguard import rejects_malformed

IMAGE_FORMATS = ("png", "jpeg", "gif", "webp", "bmp", "tiff", "qoi", "ppm")


def sniff_format(payload: bytes) -> str | None:
    """Magic-number format tag, or None for unrecognized bytes. Covers the
    engine's image / audio / video / archive surface."""
    p = payload
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if p[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "webp"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "avi"
    if p[:2] == b"BM":
        return "bmp"
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if p[:4] == b"qoif":
        return "qoi"
    if p[:2] == b"P6":
        return "ppm"
    if p[:9] == b"YUV4MPEG2":
        return "y4m"
    if len(p) >= 12 and p[4:8] == b"ftyp":
        return "mp4"
    if p[:4] == b"fLaC":
        return "flac"
    if p[:3] == b"ID3" or (
        len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if p[:2] == b"\x1f\x8b":
        return "gzip"
    if len(p) > 262 and p[257:262] == b"ustar":
        return "tar"
    if p[:5] == b"<?xml" or p[:1] == b"<":
        return "xml"
    return None


def _jpeg_dims(p: bytes) -> tuple[int, int]:
    """Marker walk to the first SOF segment (same walk as jpegkit's
    comment/EXIF scans) — no entropy decode."""
    pos = 2
    n = len(p)
    while pos + 4 <= n:
        if p[pos] != 0xFF:
            raise ValueError("jpeg: desynced marker walk")
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (size,) = struct.unpack_from(">H", p, pos + 2)
        # SOF0..SOF15 excluding DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", p, pos + 5)
            return w, h
        if marker == 0xD9:
            break
        pos += 2 + size
    raise ValueError("jpeg: no SOF before EOI")


def _webp_dims(p: bytes) -> tuple[int, int]:
    if p[12:16] == b"VP8L" and p[20] == 0x2F:
        (bits,) = struct.unpack_from("<I", p, 21)
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h
    raise ValueError("webp: only VP8L dims supported")


def _tiff_dims(p: bytes) -> tuple[int, int]:
    from .exifkit import _entry_value, _read_ifd

    e = "<" if p[:2] == b"II" else ">"
    (off,) = struct.unpack_from(e + "I", p, 4)
    tags = {
        tag: _entry_value(p, typ, count, field, e)
        for tag, typ, count, field in _read_ifd(p, off, e)
    }
    return int(tags[256]), int(tags[257])


@rejects_malformed("probe")
def image_dims(payload: bytes) -> tuple[str, int, int]:
    """(fmt, w, h) from the container header alone — pixel data untouched.
    Raises on non-image or malformed headers."""
    fmt = sniff_format(payload)
    p = payload
    if fmt == "png":
        if p[12:16] != b"IHDR":
            raise ValueError("png: first chunk is not IHDR")
        w, h = struct.unpack_from(">II", p, 16)
        return fmt, w, h
    if fmt == "jpeg":
        w, h = _jpeg_dims(p)
        return fmt, w, h
    if fmt == "gif":
        w, h = struct.unpack_from("<HH", p, 6)
        return fmt, w, h
    if fmt == "webp":
        w, h = _webp_dims(p)
        return fmt, w, h
    if fmt == "bmp":
        w, h = struct.unpack_from("<ii", p, 18)
        return fmt, w, abs(h)  # negative height = top-down variant
    if fmt == "tiff":
        w, h = _tiff_dims(p)
        return fmt, w, h
    if fmt == "qoi":
        w, h = struct.unpack_from(">II", p, 4)
        return fmt, w, h
    if fmt == "ppm":
        parts = p.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        return fmt, w, h
    raise ValueError(f"probe: not an image format ({fmt!r})")
