"""MJPEG-in-MP4 codec (functions/mp4kit.py): sample-table extraction
(stsz/stsc/stco walk), per-sample baseline-JPEG round-trip quality, probe
consistency, codec gating, and the frame_sample crawl-lane dispatch."""

import struct

import numpy as np
import pytest

from europarl_crawler_spark.functions import jpegkit, mp4kit


def _gradient_frames(n=3, h=16, w=16):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((n, h, w, 3), dtype=np.uint8)
    for f in range(n):
        for c in range(3):
            frames[f, :, :, c] = np.clip(
                20 * (c + 1) + xx * 4 + yy * 4 + f * 16, 0, 255
            )
    return frames


def test_samples_round_trip_the_writer():
    # opaque blobs in, identical blobs out — the sample walk is exact
    blobs = [bytes([i] * (10 + 7 * i)) for i in range(5)]
    body = mp4kit.mp4_write(32, 16, 5, 10, blobs)
    assert mp4kit.mp4_samples(body) == blobs


def test_samples_multi_chunk_stsc_expansion():
    """A hand-boxed two-chunk layout (stsc: chunk 1 → 2 samples, chunks 2+ →
    1 sample) exercises the run-length sample-to-chunk mapping the single-
    chunk writer never produces."""
    blobs = [b"AAAA", b"BBBBBB", b"CC"]
    entry = struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1)
    new_stsc = struct.pack(">I", 8 + 8 + len(entry)) + b"stsc" + struct.pack(
        ">II", 0, 2
    ) + entry
    # simplest correct route: rebuild container manually around raw mdat
    mdat_payload = b"".join(blobs)
    # chunk 1 holds blobs[0:2], chunk 2 holds blobs[2]
    # (offsets patched below once the moov size is known)
    sizes = struct.pack(">III", 0, 0, 3) + b"".join(
        struct.pack(">I", len(b)) for b in blobs
    )
    stsz = struct.pack(">I", 8 + len(sizes)) + b"stsz" + sizes

    def boxed(fourcc, payload):
        return struct.pack(">I", 8 + len(payload)) + fourcc + payload

    hdlr = boxed(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide"
                 + b"\x00" * 12 + b"v\x00")

    def assemble(off1, off2):
        stco = boxed(b"stco", struct.pack(">II", 0, 2)
                     + struct.pack(">II", off1, off2))
        stbl = boxed(b"stbl", stsz + new_stsc + stco)
        minf = boxed(b"minf", stbl)
        mdia = boxed(b"mdia", hdlr + minf)
        trak = boxed(b"trak", mdia)
        return boxed(b"moov", trak)

    ftyp = boxed(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov_len = len(assemble(0, 0))
    base = len(ftyp) + moov_len + 8
    body = ftyp + assemble(base, base + len(blobs[0]) + len(blobs[1])) + boxed(
        b"mdat", mdat_payload
    )
    assert mp4kit.mp4_samples(body) == blobs


def test_mjpeg_roundtrip_psnr_probe_consistency():
    frames = _gradient_frames(2, 16, 16)
    body = mp4kit.mp4_encode_mjpeg(frames, fps=12, quality=95)
    info = mp4kit.mp4_probe(body)
    assert (info["codec"], info["w"], info["h"], info["n_samples"],
            info["fps"]) == ("mjpg", 16, 16, 2, 12)
    dec, fps = mp4kit.mp4_decode(body)
    assert dec.shape == (2, 16, 16, 3) and fps == 12
    mse = float(np.mean((frames.astype(np.float64) - dec) ** 2))
    psnr = 10 * np.log10(255.0**2 / mse) if mse else float("inf")
    # oracle invariant is >= 40 dB; measured floor on smooth gradients ~58
    assert psnr >= 50.0


def test_samples_are_genuine_jpeg_bitstreams():
    frames = _gradient_frames(2)
    body = mp4kit.mp4_encode_mjpeg(frames, fps=25, quality=90)
    for s in mp4kit.mp4_samples(body):
        assert s[:2] == b"\xff\xd8" and s[-2:] == b"\xff\xd9"
        assert jpegkit.jpeg_decode(s).shape == (16, 16, 3)


def test_decode_gates_on_codec_fourcc():
    body = mp4kit.mp4_write(8, 8, 1, 10, [b"\x00" * 16], codec=b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4kit.mp4_decode(body)


def test_sample_out_of_range_is_truncation():
    frames = _gradient_frames(1)
    body = mp4kit.mp4_encode_mjpeg(frames, fps=10)
    # inflate the declared size of sample 0 past the file end: boxes still
    # tile (mdat untouched) but the sample table now lies
    at = body.index(b"stsz")
    (n,) = struct.unpack_from(">I", body, at + 12)
    patched = bytearray(body)
    struct.pack_into(">I", patched, at + 16, len(body))
    with pytest.raises(ValueError, match="truncat|out of range"):
        mp4kit.mp4_samples(bytes(patched))


def test_frame_sample_dispatch(spark):
    """fmt='mp4' flows through the same Arrow stage as y4m/avi — real
    per-sample decode, phash emitted, BT.601 luma from decoded RGB."""
    from europarl_crawler_spark.operators.multimodal import frame_sample

    frames = _gradient_frames(4, 16, 16)
    body = mp4kit.mp4_encode_mjpeg(frames, fps=12, quality=95)
    df = spark.createDataFrame(
        [("v1", bytearray(body), "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    rows = frame_sample(df, every_n=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 2]
    for r, fidx in zip(rows, (0, 2)):
        assert (r.w, r.h) == (16, 16)
        p = frames[fidx].astype(np.int64)
        luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
        assert abs(r.mean_y - float(luma.mean())) < 2.0
        assert r.phash is not None
