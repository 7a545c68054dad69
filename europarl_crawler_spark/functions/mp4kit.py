"""MP4 / ISO BMFF (ISO 14496-12) container prober, writer, and MJPEG codec.

H.264/H.265 decode means entropy + prediction and stays stubbed in this
sandbox; Motion-JPEG in mp4 (codec fourcc ``mjpg`` — the same
VisualSampleEntry layout QuickTime defined) is REAL here: every sample is a
complete baseline-JPEG bitstream, so ``mp4_decode`` = sample-table walk
(stsz/stsc/stco) + the genuine JPEG decoder in functions/jpegkit.py, exactly
how the AVI lane decodes MJPG-in-RIFF (functions/avikit.py). The part a
web-scale pipeline runs over EVERY crawled mp4 regardless of codec is the
container walk: box tree → track dims, codec fourcc, duration, frame count,
fps. ``mp4_probe`` implements that from the public box layout (size+fourcc
framing, full-box version field, mvhd/tkhd/mdhd/stsd/stsz/stts), including
64-bit largesize boxes and version-1 headers, so it parses real-world files.
``mp4_write`` emits a structurally-genuine minimal mp4 (ftyp + moov with one
video trak + full sample tables + mdat); ``mp4_encode_mjpeg`` fills it with
real JPEG samples for the synthetic-web side.

Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52).

Scale shape: probing touches only the box headers and sample tables —
O(kB) per payload regardless of media size — inside the same Arrow batch
stage as the other probes (operators/multimodal.py).
"""

from __future__ import annotations

import struct

from .kitguard import rejects_malformed


def _boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) across a box run."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4: malformed box size")
        yield fourcc, body, pos + size
        pos += size
    if pos != end:
        # ISO BMFF boxes tile their container exactly; a 1-7 byte remainder
        # is a truncated box header, not padding
        raise ValueError("mp4: truncated box header")


CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@rejects_malformed("mp4")
def mp4_probe(body: bytes) -> dict:
    """Box-walk → (brand, duration_ms, w, h, codec, n_samples, fps). The
    video trak's numbers win; fps = timescale-exact n_samples·mdhd_timescale
    / track media duration, rounded. Raises ValueError unless a well-formed
    ftyp + moov are present (the dispatcher's not-an-mp4 signal)."""
    if len(body) < 16 or body[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp box")
    brand = body[8:12].decode("latin1")
    info = {
        "brand": brand, "duration_ms": None, "w": None, "h": None,
        "codec": None, "n_samples": None, "fps": None,
    }
    saw_moov = False
    # per-track accumulator; committed to info when the track is video
    trk: dict = {}

    def walk(pos: int, end: int) -> None:
        nonlocal saw_moov, trk
        for fourcc, p, q in _boxes(body, pos, end):
            if fourcc in CONTAINERS:
                if fourcc == b"trak":
                    trk = {}
                saw_moov = saw_moov or fourcc == b"moov"
                walk(p, q)
                if fourcc == b"trak" and trk.get("is_video"):
                    info["w"], info["h"] = trk.get("w"), trk.get("h")
                    info["codec"] = trk.get("codec")
                    info["n_samples"] = trk.get("n_samples")
                    dur, ts = trk.get("duration"), trk.get("timescale")
                    if dur and ts and trk.get("n_samples"):
                        info["fps"] = round(trk["n_samples"] * ts / dur)
                continue
            ver = body[p] if q > p else 0
            if fourcc == b"mvhd":
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", body, p + 20)
                else:
                    ts, dur = struct.unpack_from(">II", body, p + 12)
                if ts:
                    info["duration_ms"] = dur * 1000 // ts
            elif fourcc == b"tkhd":
                # width/height: 16.16 fixed point at the box tail
                w_fx, h_fx = struct.unpack_from(">II", body, q - 8)
                trk["w"], trk["h"] = w_fx >> 16, h_fx >> 16
            elif fourcc == b"mdhd":
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", body, p + 20)
                else:
                    ts, dur = struct.unpack_from(">II", body, p + 12)
                trk["timescale"], trk["duration"] = ts, dur
            elif fourcc == b"hdlr":
                trk["is_video"] = body[p + 8 : p + 12] == b"vide"
            elif fourcc == b"stsd":
                (n_entries,) = struct.unpack_from(">I", body, p + 4)
                if n_entries >= 1:
                    trk["codec"] = body[p + 12 : p + 16].decode("latin1")
            elif fourcc == b"stsz":
                _sz, cnt = struct.unpack_from(">II", body, p + 4)
                trk["n_samples"] = cnt

    walk(0, len(body))
    if not saw_moov:
        raise ValueError("mp4: missing moov box")
    if info["n_samples"]:
        # the sample table declares media data; a file whose mdat box is
        # entirely missing is a truncated download even though every box
        # present parses (boxes tile exactly, so a partial mdat raises above)
        if not any(f == b"mdat" for f, _, _ in _boxes(body, 0, len(body))):
            raise ValueError("mp4: missing mdat (truncated stream)")
    return info


@rejects_malformed("mp4")
def mp4_samples(body: bytes) -> list[bytes]:
    """The video track's raw sample bytes via its stsz/stsc/stco tables —
    the ISO BMFF sample-to-chunk walk: stsc run-length-maps chunks to
    samples-per-chunk, stco gives each chunk's absolute file offset, stsz
    sizes lay samples consecutively within a chunk. Codec-agnostic; raises
    ValueError when any declared sample falls outside the body (a truncated
    download that still box-parses)."""
    trk: dict = {}
    video: dict | None = None

    def walk(pos: int, end: int) -> None:
        nonlocal trk, video
        for fourcc, p, q in _boxes(body, pos, end):
            if fourcc in CONTAINERS:
                if fourcc == b"trak":
                    trk = {}
                walk(p, q)
                if fourcc == b"trak" and trk.get("is_video") and video is None:
                    video = trk
                continue
            if fourcc == b"hdlr":
                trk["is_video"] = body[p + 8 : p + 12] == b"vide"
            elif fourcc == b"stsz":
                _sz, cnt = struct.unpack_from(">II", body, p + 4)
                if _sz:  # constant-size shorthand: no per-sample entries
                    trk["sizes"] = [_sz] * cnt
                else:
                    trk["sizes"] = list(
                        struct.unpack_from(f">{cnt}I", body, p + 12)
                    )
            elif fourcc == b"stsc":
                (n,) = struct.unpack_from(">I", body, p + 4)
                trk["stsc"] = [
                    struct.unpack_from(">III", body, p + 8 + 12 * i)[:2]
                    for i in range(n)
                ]
            elif fourcc == b"stco":
                (n,) = struct.unpack_from(">I", body, p + 4)
                trk["offsets"] = list(struct.unpack_from(f">{n}I", body, p + 8))

    walk(0, len(body))
    if not video or "sizes" not in video or "offsets" not in video:
        raise ValueError("mp4: no video sample tables")
    sizes, offsets = video["sizes"], video["offsets"]
    stsc = video.get("stsc") or [(1, len(sizes))]
    out: list[bytes] = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = next(
            spc for first, spc in reversed(stsc) if first <= ci
        )
        off = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            size = sizes[si]
            if off + size > len(body):
                raise ValueError("mp4: sample out of range (truncated)")
            out.append(body[off : off + size])
            off += size
            si += 1
    if si != len(sizes):
        raise ValueError("mp4: sample count / chunk tables disagree")
    return out


@rejects_malformed("mp4")
def mp4_decode(body: bytes):
    """MJPEG-in-mp4 bytes → ((n, h, w, 3) uint8 RGB frames, fps). Every
    sample must be a baseline-JPEG bitstream (codec fourcc ``mjpg``); other
    codecs raise NotImplementedError — the honest sandbox boundary (no
    ffmpeg), same as the AVI lane's MJPG-only contract."""
    import numpy as np

    from . import jpegkit

    info = mp4_probe(body)
    if (info["codec"] or "").lower() not in ("mjpg", "jpeg"):
        raise NotImplementedError(
            f"mp4 codec {info['codec']!r} requires an ffmpeg-like decoder; "
            "mjpg (Motion-JPEG) is the real lane in this sandbox"
        )
    frames = [jpegkit.jpeg_decode(s) for s in mp4_samples(body)]
    if not frames:
        raise ValueError("mp4: no video samples")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("mp4: inconsistent frame dims across samples")
    return np.stack(frames), int(info["fps"] or 25)


def mp4_encode_mjpeg(frames, fps: int = 25, quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 frames → Motion-JPEG mp4: each frame a genuine
    baseline-JPEG sample (functions/jpegkit.py), boxed by ``mp4_write`` with
    codec fourcc ``mjpg``."""
    from . import jpegkit

    n, h, w, _ = frames.shape
    samples = [jpegkit.jpeg_encode(frames[i], quality=quality) for i in range(n)]
    return mp4_write(w, h, n, fps, samples, codec=b"mjpg")


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def mp4_write(
    w: int, h: int, n_frames: int, fps: int, samples: list[bytes],
    codec: bytes = b"mp4v", timescale: int = 1000,
) -> bytes:
    """Minimal standards-shaped mp4: ftyp + moov (mvhd, one video trak with
    tkhd/mdhd/hdlr/stbl sample tables) + mdat holding ``samples``. The
    sample bytes are opaque to the container (codec fourcc declares them) —
    this is the synthetic-web payload generator for the probe lane."""
    if len(samples) != n_frames:
        raise ValueError("mp4: one sample blob per frame required")
    dur = n_frames * timescale // fps

    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0) + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7) + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    # VisualSampleEntry: 86 bytes total including its own size+fourcc
    sample_entry = (
        struct.pack(">I", 86) + codec + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1) + b"\x00" * 32
        + struct.pack(">hH", 24, 0xFFFF)
    )
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = _box(
        b"stts",
        struct.pack(">II", 0, 1) + struct.pack(">II", n_frames, timescale // fps),
    )
    stsc = _box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, n_frames, 1))
    stsz = _box(
        b"stsz",
        struct.pack(">III", 0, 0, n_frames)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    # stco patched after moov size is known (mdat payload offset)
    stbl_wo_stco = stsd + stts + stsc + stsz

    def assemble(chunk_offset: int) -> bytes:
        stco = _box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", chunk_offset))
        stbl = _box(b"stbl", stbl_wo_stco + stco)
        minf = _box(b"minf", _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0)) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov_len = len(assemble(0))
    mdat_payload = b"".join(samples)
    offset = len(ftyp) + moov_len + 8  # first byte inside mdat
    return ftyp + assemble(offset) + _box(b"mdat", mdat_payload)
