"""Ogg container (RFC 3533) + Opus identification header (RFC 7845) —
page-level writer and prober.

The streaming-audio container a crawler meets beside mp3/mp4: Ogg frames
codec packets into CRC-protected pages with 255-byte lacing, and Opus
(the dominant codec in it) declares channels/pre-skip/input-rate in an
``OpusHead`` packet on the first page. This kit implements the container
layer for real — page framing, the Ogg CRC-32 (poly 0x04C11DB7,
unreflected, init/xorout 0 — NOT zlib's), lacing, continuation flags,
granule positions — while Opus AUDIO decode stays a declared boundary
(SILK/CELT needs a codec library): the same container-real/codec-stubbed
stance as mp4/H.264.

probe output feeds operators/multimodal.py:media_probe: kind=audio,
samplerate (OpusHead input rate), channels, n_frames (= packets after the
two header packets), duration_ms (last granule / 48 kHz, the Opus clock,
minus pre-skip).
"""

from __future__ import annotations

import struct

from .kitguard import rejects_malformed

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    packets: list[bytes],
    serial: int,
    seq: int,
    granule: int,
    header_type: int,
) -> bytes:
    """One Ogg page carrying whole ``packets`` (each < 255·255 here; the
    segment table lacing terminates every packet with a < 255 lacing
    value, per RFC 3533 §6)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += p
    if len(lacing) > 255:
        raise ValueError("ogg: too many segments for one page")
    head = (
        b"OggS" + bytes((0, header_type))
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes((len(lacing),)) + bytes(lacing)
    )
    crc = ogg_crc(head + bytes(body))
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + bytes(body)


def opus_head(channels: int = 1, pre_skip: int = 312,
              input_rate: int = 48000) -> bytes:
    return (
        b"OpusHead" + bytes((1, channels))
        + struct.pack("<HIhB", pre_skip, input_rate, 0, 0)
    )


def ogg_opus_synthesize(
    n_audio_packets: int,
    serial: int = 1,
    channels: int = 1,
    input_rate: int = 48000,
    samples_per_packet: int = 960,  # 20 ms at the 48 kHz Opus clock
    seed: int = 0,
) -> bytes:
    """A structurally-genuine Ogg Opus stream: page 0 = OpusHead (BOS),
    page 1 = OpusTags, then one audio page per 4 packets with correct
    granule positions (cumulative 48 kHz samples), EOS on the last page.
    Packet bodies are deterministic filler — container-real, codec-stub."""
    pages = [
        _page([opus_head(channels, input_rate=input_rate)], serial, 0, 0, 0x02),
        _page(
            [b"OpusTags" + struct.pack("<I", 7) + b"synthed"
             + struct.pack("<I", 0)],
            serial, 1, 0, 0x00,
        ),
    ]
    seq = 2
    done = 0
    granule = 0
    while done < n_audio_packets:
        k = min(4, n_audio_packets - done)
        pk = []
        for j in range(k):
            n = 40 + ((seed + done + j) * 37) % 160
            pk.append(bytes(((seed + done + j + i) % 256 for i in range(n))))
        done += k
        granule += k * samples_per_packet
        last = done >= n_audio_packets
        pages.append(_page(pk, serial, seq, granule, 0x04 if last else 0x00))
        seq += 1
    return b"".join(pages)


@rejects_malformed("ogg")
def ogg_probe(body: bytes) -> dict:
    """Page walk with CRC verification → {channels, samplerate, n_pages,
    n_packets (audio), duration_ms, pre_skip}. Raises on bad capture
    pattern, bad CRC, version != 0, or a non-Opus first packet."""
    pos = 0
    n = len(body)
    n_pages = 0
    n_packets = 0
    last_granule = 0
    head_pkt: bytes | None = None
    while pos < n:
        if body[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost capture pattern")
        if body[pos + 4] != 0:
            raise ValueError("ogg: unsupported version")
        granule, _serial, _seq, crc_stored = struct.unpack_from(
            "<qIIi", body, pos + 6
        )
        nseg = body[pos + 26]
        lacing = body[pos + 27 : pos + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("ogg: truncated segment table")
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > n:
            raise ValueError("ogg: truncated page body")
        page = bytearray(body[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored & 0xFFFFFFFF:
            raise ValueError("ogg: page CRC mismatch")
        # packets on this page = lacing values < 255 (packet terminators)
        pkts = sum(1 for v in lacing if v < 255)
        if n_pages == 0:
            off = pos + 27 + nseg
            head_pkt = body[off : off + body_len]
        elif n_pages >= 2:
            n_packets += pkts
        if granule > 0:
            last_granule = granule
        n_pages += 1
        pos = page_end
    if head_pkt is None or head_pkt[:8] != b"OpusHead":
        raise ValueError("ogg: first packet is not OpusHead")
    channels = head_pkt[9]
    pre_skip, input_rate = struct.unpack_from("<HI", head_pkt, 10)
    dur_ms = max(last_granule - pre_skip, 0) * 1000 // 48000
    return dict(
        channels=channels,
        samplerate=input_rate,
        pre_skip=pre_skip,
        n_pages=n_pages,
        n_packets=n_packets,
        duration_ms=dur_ms,
    )
