"""MJPEG-in-AVI codec (functions/avikit.py): RIFF container structure, the
avih/strh header probe, per-frame baseline-JPEG round-trip quality, idx1
index integrity, and the frame_sample crawl-lane dispatch."""

import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import avikit, jpegkit


def _gradient_frames(n=3, h=16, w=16):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((n, h, w, 3), dtype=np.uint8)
    for f in range(n):
        for c in range(3):
            frames[f, :, :, c] = np.clip(
                20 * (c + 1) + xx * 4 + yy * 4 + f * 16, 0, 255
            )
    return frames


def test_container_and_header_probe():
    frames = _gradient_frames(3, 16, 24)
    body = avikit.avi_encode(frames, fps=12, quality=90)
    assert body[:4] == b"RIFF" and body[8:12] == b"AVI "
    assert avikit.avi_header_info(body) == (24, 16, 3, 12)
    # idx1 has one 16-byte entry per frame, keyframe flag set
    at = body.index(b"idx1")
    (size,) = struct.unpack_from("<I", body, at + 4)
    assert size == 3 * 16
    fourcc, flags, _off, _len = struct.unpack_from("<4sIII", body, at + 8)
    assert fourcc == b"00dc" and flags == 0x10


def test_roundtrip_psnr_and_fps():
    frames = _gradient_frames(2, 16, 16)
    body = avikit.avi_encode(frames, fps=12, quality=95)
    dec, fps = avikit.avi_decode(body)
    assert dec.shape == (2, 16, 16, 3) and fps == 12
    mse = float(np.mean((frames.astype(np.float64) - dec) ** 2))
    psnr = 10 * np.log10(255.0**2 / mse) if mse else float("inf")
    # oracle invariant is >= 40 dB; measured floor on smooth gradients ~58
    assert psnr >= 50.0


def test_frames_are_genuine_jpeg_bitstreams():
    frames = _gradient_frames(2)
    body = avikit.avi_encode(frames, fps=25, quality=90)
    # every 00dc payload is a standalone SOI..EOI baseline JPEG that
    # jpegkit decodes independently of the container
    found = 0
    pos = body.index(b"movi") + 4
    while pos + 8 <= len(body):
        fourcc = body[pos : pos + 4]
        (size,) = struct.unpack_from("<I", body, pos + 4)
        if fourcc == b"00dc":
            j = body[pos + 8 : pos + 8 + size]
            assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
            assert jpegkit.jpeg_decode(j).shape == (16, 16, 3)
            found += 1
        pos += 8 + size + (size % 2)
        if fourcc == b"idx1":
            break
    assert found == 2


def test_compression_vs_raw():
    # big enough that pixel data dominates the fixed per-frame table overhead
    frames = _gradient_frames(4, 64, 64)
    body = avikit.avi_encode(frames, fps=25, quality=90)
    assert len(body) < frames.nbytes // 4  # DCT+Huffman actually bites


def test_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="RIFF"):
        avikit.avi_decode(b"not an avi file....")
    with pytest.raises(ValueError, match="00dc"):
        # valid RIFF/AVI framing but no frames
        avikit.avi_decode(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_frame_sample_dispatch(spark):
    """fmt='avi' flows through the same Arrow stage as y4m — real per-frame
    decode, phash emitted, BT.601 luma recomputed from decoded RGB."""
    from europarl_crawler_spark.operators.multimodal import frame_sample

    frames = _gradient_frames(4, 16, 16)
    body = avikit.avi_encode(frames, fps=12, quality=95)
    df = spark.createDataFrame(
        [("v1", bytearray(body), "avi")],
        "video_id string, bytes binary, fmt string",
    )
    rows = frame_sample(df, every_n=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 2]
    for r, fidx in zip(rows, (0, 2)):
        assert (r.w, r.h) == (16, 16)
        # luma within lossy tolerance of the source frame's BT.601 mean
        p = frames[fidx].astype(np.int64)
        luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
        assert abs(r.mean_y - float(luma.mean())) < 2.0
        assert r.phash is not None
