"""MPEG audio (mp3) frame-header prober — pure stdlib.

Full MPEG-1 Layer III *sample* decode needs the hybrid filterbank + large
Huffman table set and stays stubbed in this sandbox. What a web-scale
pipeline actually needs from 99% of crawled mp3 bytes is the cheap part:
walk the frame headers and report codec/bitrate/samplerate/duration —
that's this module, implemented from the public MPEG frame-header layout
(11-bit sync, version/layer ids, bitrate + samplerate tables, padding bit)
plus ID3v2 tag skipping. ``mp3_probe`` parses real-world files; the
synthetic-web side emits structurally-genuine frames (correct headers +
correct per-frame lengths) so the lane is exercised end-to-end.

Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52) — metadata extraction
for formats whose full decode isn't warranted at crawl time.

Scale shape: header walking is O(bytes) with a few comparisons per frame —
it runs inside the same Arrow batch stage as the other probes
(operators/multimodal.py), parallelism = payload count.
"""

from __future__ import annotations

import struct

from .kitguard import rejects_malformed

# Public MPEG-1/2 Layer III bitrate table (kbps); index 0 = free, 15 = bad.
BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
# Sample-rate table by version id (00=MPEG2.5, 10=MPEG2, 11=MPEG1).
SAMPLERATE = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
SAMPLES_PER_FRAME = {3: 1152, 2: 576, 0: 576}  # Layer III, by version id


def id3v2_size(body: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none) — syncsafe size."""
    if body[:3] != b"ID3" or len(body) < 10:
        return 0
    b = body[6:10]
    return 10 + ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14 | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def frame_header(body: bytes, pos: int) -> dict | None:
    """Parse one Layer III frame header at ``pos``; None if not a valid one."""
    if pos + 4 > len(body):
        return None
    h = struct.unpack_from(">I", body, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None  # no sync
    version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = (BITRATE_V1_L3 if version == 3 else BITRATE_V2_L3)[br_idx] * 1000
    samplerate = SAMPLERATE[version][sr_idx]
    padding = (h >> 9) & 0x1
    channel_mode = (h >> 6) & 0x3  # 3 = mono
    spf = SAMPLES_PER_FRAME[version]
    # Layer III frame length: floor(spf/8 * bitrate / samplerate) + padding
    length = (spf // 8) * bitrate // samplerate + padding
    return {
        "version": version,
        "bitrate": bitrate,
        "samplerate": samplerate,
        "channels": 1 if channel_mode == 3 else 2,
        "samples": spf,
        "length": length,
    }


@rejects_malformed("mp3")
def mp3_probe(body: bytes) -> dict:
    """Walk every frame header: (n_frames, samplerate, channels, bitrate_kbps
    mode/average, duration_ms, vbr). Raises ValueError when no valid frame
    sync is found (the dispatcher's signal that bytes aren't mp3)."""
    pos = id3v2_size(body)
    n = 0
    samplerate = channels = None
    bitrates: dict[int, int] = {}
    samples = 0
    while pos + 4 <= len(body):
        fh = frame_header(body, pos)
        if fh is None:
            if n == 0:
                pos += 1  # resync scan before the first frame only
                continue
            break  # trailing junk / tag after a valid stream: stop
        if samplerate is None:
            samplerate, channels = fh["samplerate"], fh["channels"]
        elif fh["samplerate"] != samplerate:
            break  # a new stream's parameters: treat as end
        if pos + fh["length"] > len(body):
            # valid header but the frame body is cut off — a truncated
            # download, not trailing junk; reject instead of undercounting
            raise ValueError("mp3: truncated final frame")
        n += 1
        samples += fh["samples"]
        bitrates[fh["bitrate"]] = bitrates.get(fh["bitrate"], 0) + 1
        pos += fh["length"]
    if n == 0:
        raise ValueError("mp3: no valid Layer III frame sync found")
    duration_ms = samples * 1000 // samplerate
    mode_bitrate = max(bitrates.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return {
        "n_frames": n,
        "samplerate": samplerate,
        "channels": channels,
        "bitrate_kbps": mode_bitrate // 1000,
        "duration_ms": duration_ms,
        "vbr": len(bitrates) > 1,
    }


def mp3_synthesize(
    n_frames: int,
    bitrate_kbps: int = 128,
    samplerate: int = 44100,
    mono: bool = True,
    seed: int = 0,
) -> bytes:
    """Structurally-genuine MPEG-1 Layer III bytes: every frame has a correct
    header and exact frame length; the payload is deterministic filler (a
    full psychoacoustic encoder isn't warranted — the probe lane reads
    headers, the sample decoder is the declared stub). Raises on a
    bitrate/samplerate pair outside the MPEG-1 tables."""
    br_idx = BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = SAMPLERATE[3].index(samplerate)
    out = bytearray()
    for i in range(n_frames):
        h = (
            0x7FF << 21
            | 3 << 19  # MPEG-1
            | 1 << 17  # Layer III
            | 1 << 16  # no CRC
            | br_idx << 12
            | sr_idx << 10
            | 0 << 9  # no padding
            | (3 if mono else 0) << 6
        )
        length = 144 * bitrate_kbps * 1000 // samplerate
        out += struct.pack(">I", h)
        body = bytes(((seed + i + j) * 2654435761 >> 7) & 0xFF for j in range(length - 4))
        out += body
    return bytes(out)
