"""EXIF (APP1/TIFF IFD) build + parse — the third image-metadata mining
surface beside PNG text chunks (imaging.png_text_chunks) and JPEG COM
segments (jpegkit.jpeg_comments).

A crawl that stores image+caption pairs mines EXIF for captions
(ImageDescription), display rotation (Orientation — without it a CLIP-style
alignment stage scores sideways pixels), capture time (DateTime) and the
camera-recorded pixel dimensions (Exif sub-IFD PixelX/YDimension, the
cross-check against the container's SOF dims). The reference's
postprocessors mine document metadata the same way from XML sidecars
(reference: europarl/postprocessing/postprocessors.py); this kit is the
image-payload analog of that metadata-extraction stage.

Format (Exif 2.3 / TIFF 6.0, public specs):

- JPEG carries EXIF in an APP1 segment (marker 0xFFE1) whose payload is
  ``b"Exif\\x00\\x00"`` + a self-contained TIFF stream.
- TIFF header: 2-byte byte order (``II`` little / ``MM`` big), magic 42,
  4-byte offset of IFD0 (all offsets relative to the TIFF header start).
- An IFD is a 2-byte entry count, then count × 12-byte entries
  (tag u16, type u16, count u32, value-or-offset u32), then a 4-byte
  next-IFD offset. Values that fit in 4 bytes are inlined left-justified;
  larger values live in a data area addressed by offset.
- Entries must be sorted by tag (TIFF 6.0 §2); IFD0's tag 0x8769 points at
  the Exif sub-IFD.

Both byte orders are real in the wild (II: most cameras; MM: some phones
and all big-endian TIFF toolchains), so the parser handles both and the
builder can emit either — the oracle lane embeds half the corpus as MM so
byte-order handling is value-checked, not just unit-tested.
"""

from __future__ import annotations

import struct

from europarl_crawler_spark.functions.kitguard import rejects_malformed

EXIF_HEADER = b"Exif\x00\x00"

TAG_IMAGE_DESCRIPTION = 0x010E  # ASCII
TAG_ORIENTATION = 0x0112  # SHORT
TAG_SOFTWARE = 0x0131  # ASCII
TAG_DATETIME = 0x0132  # ASCII
TAG_EXIF_IFD = 0x8769  # LONG (offset of the Exif sub-IFD)
TAG_GPS_IFD = 0x8825  # LONG (offset of the GPS IFD — the location-PII block)
TAG_PIXEL_X = 0xA002  # LONG (Exif sub-IFD)
TAG_PIXEL_Y = 0xA003  # LONG (Exif sub-IFD)

# GPS IFD tags (Exif 2.3 §4.6.6)
GPS_TAG_LAT_REF = 0x0001  # ASCII 2: 'N'/'S'
GPS_TAG_LAT = 0x0002  # RATIONAL ×3: deg, min, sec
GPS_TAG_LON_REF = 0x0003  # ASCII 2: 'E'/'W'
GPS_TAG_LON = 0x0004  # RATIONAL ×3

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5
_TYPE_SIZE = {1: 1, _TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_RATIONAL: 8}


def exif_build(
    description: str,
    orientation: int,
    software: str,
    datetime: str,
    pixel_x: int,
    pixel_y: int,
    byte_order: str = "II",
    gps: tuple | None = None,
) -> bytes:
    """Build a complete APP1 payload: ``Exif\\x00\\x00`` + TIFF with IFD0
    (ImageDescription, Orientation, Software, DateTime, ExifIFD pointer,
    optionally a GPSInfo pointer) and an Exif sub-IFD (PixelXDimension,
    PixelYDimension).

    ``gps`` is (lat_ref, lat_dms, lon_ref, lon_dms) with refs 'N'/'S' and
    'E'/'W' and each dms a sequence of three (numerator, denominator)
    RATIONAL pairs — the Exif 2.3 §4.6.6 location block, i.e. the
    location-PII payload ``exif_scrub_gps`` exists to remove.

    ASCII tags are written as UTF-8 + NUL — technically EXIF declares the
    type 7-bit, but UTF-8-in-ASCII is what real files contain and what
    crawl-side miners must round-trip. Strings whose encoded form fits in
    the 4-byte value field are inlined per TIFF 6.0; longer ones go to the
    trailing data area."""
    if byte_order not in ("II", "MM"):
        raise ValueError(f"exif: byte order must be II or MM, got {byte_order!r}")
    if not 1 <= orientation <= 8:
        raise ValueError(f"exif: orientation must be 1..8, got {orientation}")
    e = "<" if byte_order == "II" else ">"

    # Fixed layout: TIFF header (8) → IFD0 (2 + n0·12 + 4) → Exif sub-IFD
    # (2 + 2·12 + 4 = 30) → GPS IFD when present (2 + 4·12 + 4 = 54) →
    # data area. Entry counts are constant, so every offset is computable
    # up front.
    n0 = 6 if gps is not None else 5
    ifd0_off = 8
    sub_off = ifd0_off + 2 + n0 * 12 + 4
    gps_off = sub_off + 2 + 2 * 12 + 4
    data_off = gps_off + (2 + 4 * 12 + 4 if gps is not None else 0)

    data = bytearray()

    def ascii_field(s: str) -> tuple[int, bytes]:
        """(count, 4-byte value-or-offset field) for an ASCII tag; appends
        to the data area when the NUL-terminated bytes exceed 4."""
        raw = s.encode("utf-8") + b"\x00"
        if len(raw) <= 4:
            return len(raw), raw.ljust(4, b"\x00")
        off = data_off + len(data)
        data.extend(raw)
        return len(raw), struct.pack(e + "I", off)

    def entry(tag: int, typ: int, count: int, field: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + field

    def rational_field(pairs) -> bytes:
        """3 RATIONALs (24 bytes) always live in the data area."""
        off = data_off + len(data)
        for num, den in pairs:
            data.extend(struct.pack(e + "II", num, den))
        return struct.pack(e + "I", off)

    dc, dv = ascii_field(description)
    sc, sv = ascii_field(software)
    tc, tv = ascii_field(datetime)
    ifd0 = struct.pack(e + "H", n0)
    ifd0 += entry(TAG_IMAGE_DESCRIPTION, _TYPE_ASCII, dc, dv)
    ifd0 += entry(
        TAG_ORIENTATION, _TYPE_SHORT, 1, struct.pack(e + "H", orientation) + b"\x00\x00"
    )
    ifd0 += entry(TAG_SOFTWARE, _TYPE_ASCII, sc, sv)
    ifd0 += entry(TAG_DATETIME, _TYPE_ASCII, tc, tv)
    ifd0 += entry(TAG_EXIF_IFD, _TYPE_LONG, 1, struct.pack(e + "I", sub_off))
    if gps is not None:
        ifd0 += entry(TAG_GPS_IFD, _TYPE_LONG, 1, struct.pack(e + "I", gps_off))
    ifd0 += struct.pack(e + "I", 0)  # next IFD: none

    sub = struct.pack(e + "H", 2)
    sub += entry(TAG_PIXEL_X, _TYPE_LONG, 1, struct.pack(e + "I", pixel_x))
    sub += entry(TAG_PIXEL_Y, _TYPE_LONG, 1, struct.pack(e + "I", pixel_y))
    sub += struct.pack(e + "I", 0)

    gps_ifd = b""
    if gps is not None:
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        if lat_ref not in ("N", "S") or lon_ref not in ("E", "W"):
            raise ValueError(f"exif: bad GPS refs {lat_ref!r}/{lon_ref!r}")
        # rational fields append to the data area in entry order
        lat_f = rational_field(lat_dms)
        lon_f = rational_field(lon_dms)
        gps_ifd = struct.pack(e + "H", 4)
        gps_ifd += entry(
            GPS_TAG_LAT_REF, _TYPE_ASCII, 2,
            lat_ref.encode("ascii") + b"\x00\x00\x00",
        )
        gps_ifd += entry(GPS_TAG_LAT, _TYPE_RATIONAL, 3, lat_f)
        gps_ifd += entry(
            GPS_TAG_LON_REF, _TYPE_ASCII, 2,
            lon_ref.encode("ascii") + b"\x00\x00\x00",
        )
        gps_ifd += entry(GPS_TAG_LON, _TYPE_RATIONAL, 3, lon_f)
        gps_ifd += struct.pack(e + "I", 0)

    tiff = (
        byte_order.encode("ascii")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", ifd0_off)
        + ifd0
        + sub
        + gps_ifd
        + bytes(data)
    )
    return EXIF_HEADER + tiff


def _read_ifd(tiff: bytes, off: int, e: str) -> list[tuple[int, int, int, bytes]]:
    """One IFD → list of (tag, type, count, 4-byte value field) entries."""
    if off + 2 > len(tiff):
        raise ValueError("exif: IFD offset beyond stream")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    end = off + 2 + n * 12 + 4
    if end > len(tiff):
        raise ValueError("exif: truncated IFD")
    out = []
    for i in range(n):
        tag, typ, count = struct.unpack_from(e + "HHI", tiff, off + 2 + i * 12)
        field = tiff[off + 2 + i * 12 + 8 : off + 2 + i * 12 + 12]
        out.append((tag, typ, count, field))
    return out


def _entry_value(tiff: bytes, typ: int, count: int, field: bytes, e: str):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None  # unknown type: skip, per TIFF readers' convention
    total = size * count
    if total <= 4:
        raw = field[:total]
    else:
        (off,) = struct.unpack(e + "I", field)
        if off + total > len(tiff):
            raise ValueError("exif: value offset beyond stream")
        raw = tiff[off : off + total]
    if typ == _TYPE_ASCII:
        return raw.rstrip(b"\x00").decode("utf-8")
    if typ == _TYPE_SHORT:
        return list(struct.unpack(e + f"{count}H", raw)) if count > 1 else struct.unpack(e + "H", raw)[0]
    if typ == _TYPE_LONG:
        return list(struct.unpack(e + f"{count}I", raw)) if count > 1 else struct.unpack(e + "I", raw)[0]
    if typ == _TYPE_RATIONAL:
        # flat [num, den, num, den, ...] — keeps the exact integers
        return list(struct.unpack(e + f"{2 * count}I", raw))
    return raw


_FRIENDLY = {
    TAG_IMAGE_DESCRIPTION: "description",
    TAG_ORIENTATION: "orientation",
    TAG_SOFTWARE: "software",
    TAG_DATETIME: "datetime",
    TAG_PIXEL_X: "pixel_x",
    TAG_PIXEL_Y: "pixel_y",
}

_GPS_FRIENDLY = {
    GPS_TAG_LAT_REF: "gps_lat_ref",
    GPS_TAG_LAT: "gps_lat",
    GPS_TAG_LON_REF: "gps_lon_ref",
    GPS_TAG_LON: "gps_lon",
}


@rejects_malformed("exif")
def exif_parse(app1: bytes) -> dict:
    """APP1 payload → {description, orientation, software, datetime,
    pixel_x, pixel_y, byte_order, n_tags}. Handles II and MM, inline and
    offset values, and follows the 0x8769 sub-IFD pointer. Unknown tags
    count toward ``n_tags`` but are not surfaced; bad structure raises."""
    if app1[: len(EXIF_HEADER)] != EXIF_HEADER:
        raise ValueError("exif: missing Exif\\x00\\x00 header")
    tiff = app1[len(EXIF_HEADER) :]
    bo = tiff[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise ValueError(f"exif: bad byte order {bo!r}")
    (magic,) = struct.unpack_from(e + "H", tiff, 2)
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)

    out: dict = {"byte_order": bo.decode("ascii")}
    entries = _read_ifd(tiff, ifd0_off, e)
    sub_entries: list = []
    gps_entries: list = []
    for tag, typ, count, field in entries:
        if tag == TAG_EXIF_IFD:
            (sub_off,) = struct.unpack(e + "I", field)
            sub_entries = _read_ifd(tiff, sub_off, e)
            continue
        if tag == TAG_GPS_IFD:
            (g_off,) = struct.unpack(e + "I", field)
            gps_entries = _read_ifd(tiff, g_off, e)
            continue
        if tag in _FRIENDLY:
            out[_FRIENDLY[tag]] = _entry_value(tiff, typ, count, field, e)
    for tag, typ, count, field in sub_entries:
        if tag in _FRIENDLY:
            out[_FRIENDLY[tag]] = _entry_value(tiff, typ, count, field, e)
    for tag, typ, count, field in gps_entries:
        if tag in _GPS_FRIENDLY:
            out[_GPS_FRIENDLY[tag]] = _entry_value(tiff, typ, count, field, e)
    out["n_tags"] = len(entries) + len(sub_entries) + len(gps_entries)
    return out


@rejects_malformed("exif")
def exif_scrub_gps(app1: bytes) -> tuple[bytes, bool]:
    """Location-PII scrub: parse the APP1 payload and REBUILD it from the
    surfaced non-location fields only — a whitelist scrub, so the GPS IFD
    and any unknown/vendor tag (serials, maker notes) are dropped together,
    the stance image-privacy tooling takes (rebuilding beats in-place tag
    zeroing, which leaves offsets and data-area ghosts behind).  Returns
    (clean_app1, had_gps); the clean payload re-parses with the same
    description/orientation/software/datetime/pixel dims and byte order."""
    f = exif_parse(app1)
    clean = exif_build(
        description=f.get("description", ""),
        orientation=f.get("orientation", 1),
        software=f.get("software", ""),
        datetime=f.get("datetime", ""),
        pixel_x=f.get("pixel_x", 0),
        pixel_y=f.get("pixel_y", 0),
        byte_order=f["byte_order"],
    )
    return clean, "gps_lat" in f


@rejects_malformed("jpeg")
def jpeg_exif(body: bytes) -> dict | None:
    """Walk a JFIF marker stream (same walk as jpegkit.jpeg_comments) and
    parse the first APP1 Exif segment; None when the image carries no EXIF.
    Stops at SOS/EOI — APP segments cannot occur inside entropy data."""
    if body[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos + 4 <= len(body):
        if body[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker alignment at {pos}")
        marker = body[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS
            break
        (seg_len,) = struct.unpack(">H", body[pos + 2 : pos + 4])
        payload = body[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and payload[: len(EXIF_HEADER)] == EXIF_HEADER:
            return exif_parse(payload)
        pos += 2 + seg_len
    return None
