"""Real IMA ADPCM audio codec (WAV format tag 0x11) — pure stdlib + numpy.

This is the audio analog of functions/jpegkit.py: a genuinely COMPRESSED
lossy codec family (4 bits/sample, 4:1 vs 16-bit PCM) implemented from the
public IMA/DVI4 specification, so the crawl's audio lane exercises real
compression instead of the former mp3 stub. The container is a standards-
correct WAV: ``fmt `` chunk with wFormatTag=0x0011 + wSamplesPerBlock
extension, a ``fact`` chunk carrying the true sample count (mandatory for
compressed WAV), and block-aligned ``data`` where every block opens with a
(predictor, step-index) header — any audio tool that speaks IMA ADPCM reads
these files.

Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52) — the reference routes
payloads to format-specific decoders; this module adds the compressed-audio
decoder for that dispatch on the Spark side (operators/multimodal.py).

Codec shape: IMA ADPCM quantizes the per-sample delta to 4 bits against an
adaptive step size (89-entry table, index walked by the standard index
table). Encode/decode are sequential per sample by construction (predictor
feedback), so they run as per-payload Python inside Arrow batches — the
same cost model as the DCT/Huffman work in jpegkit: parallelism is the
payload count, never a per-sample shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from .kitguard import rejects_malformed

# Public IMA step-size table (89 entries) and index-adjust table.
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

BLOCK_ALIGN = 256  # bytes per data block → (256-4)*2+1 = 505 samples/block
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_nibble(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One IMA quantize step: returns (nibble, new_pred, new_idx)."""
    step = int(STEP_TABLE[idx])
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = _clamp16(pred - diffq if code & 8 else pred + diffq)
    idx = min(max(idx + int(INDEX_TABLE[code & 7]), 0), 88)
    return code, pred, idx


def _decode_nibble(code: int, pred: int, idx: int) -> tuple[int, int]:
    step = int(STEP_TABLE[idx])
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = _clamp16(pred - diffq if code & 8 else pred + diffq)
    idx = min(max(idx + int(INDEX_TABLE[code & 7]), 0), 88)
    return pred, idx


def adpcm_encode_blocks(samples: np.ndarray) -> bytes:
    """Mono int16 samples → IMA ADPCM data-chunk bytes (block-aligned;
    the tail block zero-pads its nibbles — the fact chunk disambiguates)."""
    s = np.asarray(samples, dtype=np.int64)
    out = bytearray()
    pos = 0
    n = len(s)
    while pos < n:
        block = s[pos : pos + SAMPLES_PER_BLOCK]
        pred = int(block[0])
        # Warm-start the step index from the block's mean |delta| — the
        # index is carried in the block header, so the decoder needs no
        # change and short clips skip the slow walk up from step 7.
        mean_d = float(np.abs(np.diff(block)).mean()) if len(block) > 1 else 0.0
        idx = int(np.searchsorted(STEP_TABLE, max(mean_d, 7.0)))
        idx = min(idx, 88)
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for sample in block[1:]:
            code, pred, idx = _encode_nibble(int(sample), pred, idx)
            nibbles.append(code)
        nibbles += [0] * ((BLOCK_ALIGN - 4) * 2 - len(nibbles))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        pos += SAMPLES_PER_BLOCK
    return bytes(out)


def adpcm_decode_blocks(data: bytes, n_samples: int) -> np.ndarray:
    """IMA ADPCM data-chunk bytes → mono int16 samples (first ``n_samples``)."""
    out = np.empty(n_samples, dtype=np.int16)
    got = 0
    pos = 0
    while got < n_samples:
        if pos + 4 > len(data):
            raise ValueError("adpcm: truncated block header")
        pred, idx, _rsv = struct.unpack_from("<hBB", data, pos)
        if idx > 88:
            raise ValueError("adpcm: step index out of range")
        pos += 4
        out[got] = pred
        got += 1
        body = data[pos : pos + BLOCK_ALIGN - 4]
        pos += BLOCK_ALIGN - 4
        for byte in body:
            for code in (byte & 0x0F, byte >> 4):
                if got >= n_samples:
                    break
                pred, idx = _decode_nibble(code, pred, idx)
                out[got] = pred
                got += 1
    return out


def adpcm_wav_encode(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """Mono int16 samples → WAV/IMA-ADPCM bytes (RIFF + fmt 0x11 + fact +
    block-aligned data). ~4:1 smaller than the equivalent 16-bit PCM."""
    s = np.asarray(samples, dtype=np.int16)
    n = len(s)
    data = adpcm_encode_blocks(s)
    avg_bps = (framerate * BLOCK_ALIGN + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, framerate, avg_bps, BLOCK_ALIGN, 4, 2,
        SAMPLES_PER_BLOCK,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@rejects_malformed("adpcm")
def adpcm_wav_decode(body: bytes) -> tuple[np.ndarray, int]:
    """WAV/IMA-ADPCM bytes → (mono int16 samples, framerate). Chunk-walking
    RIFF parser: requires fmt tag 0x0011, mono, and a fact chunk (the true
    sample count — tail-block padding is not data)."""
    if body[:4] != b"RIFF" or body[8:12] != b"WAVE":
        raise ValueError("adpcm: not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", body, 4)
    if riff_size != len(body) - 8:
        raise ValueError("adpcm: truncated container (RIFF size mismatch)")
    pos = 12
    fmt = fact = data = None
    while pos + 8 <= len(body):
        cid = body[pos : pos + 4]
        (size,) = struct.unpack_from("<I", body, pos + 4)
        if pos + 8 + size > len(body):
            raise ValueError("adpcm: truncated chunk")
        payload = body[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"fact":
            fact = payload
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("adpcm: missing fmt/data chunk")
    tag, ch, rate, _abps, balign, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011 or ch != 1 or bits != 4 or balign != BLOCK_ALIGN:
        raise ValueError("adpcm: unsupported WAV shape (need mono IMA 0x11)")
    if fact is None:
        raise ValueError("adpcm: compressed WAV requires a fact chunk")
    (n_samples,) = struct.unpack_from("<I", fact, 0)
    return adpcm_decode_blocks(data, n_samples), rate


def psnr_int16(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB over the int16 range (65535 peak-to-peak) — the audio
    analog of imaging.psnr's 255-range formula."""
    x = np.asarray(a, dtype=np.float64)
    y = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((x - y) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(65535.0**2 / mse)
