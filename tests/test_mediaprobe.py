"""Container-metadata probes (functions/mp3kit.py, functions/mp4kit.py,
operators/multimodal.py:media_probe): MPEG frame-header walking, ISO BMFF
box walking, RIFF fmt/fact parsing, corrupt-payload tolerance, and the
Arrow-stage dispatch."""

import numpy as np
import pytest

from europarl_crawler_spark.functions import avikit, mp3kit, mp4kit, videokit


def test_mp3_header_walk_exact():
    b = mp3kit.mp3_synthesize(40, 128, 44100, mono=True, seed=7)
    p = mp3kit.mp3_probe(b)
    assert p == {
        "n_frames": 40, "samplerate": 44100, "channels": 1,
        "bitrate_kbps": 128, "duration_ms": 40 * 1152 * 1000 // 44100,
        "vbr": False,
    }


def test_mp3_id3v2_skip_and_resync():
    b = mp3kit.mp3_synthesize(12, 192)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    assert mp3kit.mp3_probe(tag + b)["n_frames"] == 12
    # garbage before the first sync: resync scan finds the stream
    assert mp3kit.mp3_probe(b"\x00garbage\x00" + b)["n_frames"] == 12


def test_mp3_vbr_flag_and_mode_bitrate():
    v = mp3kit.mp3_synthesize(10, 128) + mp3kit.mp3_synthesize(30, 64)
    p = mp3kit.mp3_probe(v)
    assert p["vbr"] is True and p["n_frames"] == 40
    assert p["bitrate_kbps"] == 64  # mode (30 frames beat 10)


def test_mp3_rejects_non_mp3():
    with pytest.raises(ValueError, match="frame sync"):
        mp3kit.mp3_probe(b"RIFF....WAVE" + bytes(100))


def test_mp4_probe_exact():
    samples = [bytes([i] * 64) for i in range(5)]
    body = mp4kit.mp4_write(128, 96, 5, 25, samples, codec=b"mp4v")
    p = mp4kit.mp4_probe(body)
    assert (p["w"], p["h"], p["n_samples"], p["fps"]) == (128, 96, 5, 25)
    assert p["codec"] == "mp4v" and p["brand"] == "isom"
    assert p["duration_ms"] == 5 * 1000 // 25
    # mdat actually holds the sample bytes at the stco offset
    assert b"".join(samples) in body


def test_mp4_rejects_non_mp4():
    with pytest.raises(ValueError, match="ftyp"):
        mp4kit.mp4_probe(b"\x89PNG\r\n\x1a\n" + bytes(50))
    # ftyp alone without moov is not enough
    import struct

    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    with pytest.raises(ValueError, match="moov"):
        mp4kit.mp4_probe(ftyp)


def test_media_probe_dispatch(spark):
    """One Arrow pass over a mixed-format media table: real header parsing
    per format, ok=false + nulls for corrupt/unknown payloads."""
    from europarl_crawler_spark.operators.multimodal import (
        media_probe,
        wav_encode,
    )
    from europarl_crawler_spark.functions import adpcmkit

    sig = (3000 * np.sin(np.arange(800) / 9.0)).astype(np.int16)
    yy, xx = np.mgrid[0:16, 0:16]
    frames = np.stack(
        [np.stack([np.uint8(xx * 8 + f * 8)] * 3, axis=-1) for f in range(2)]
    )
    rows = [
        ("a_mp3", bytearray(mp3kit.mp3_synthesize(24, 128)), "mp3"),
        ("a_wav", bytearray(wav_encode(sig, 16000)), "wav"),
        ("a_ima", bytearray(adpcmkit.adpcm_wav_encode(sig, 16000)), "adpcm"),
        ("v_mp4", bytearray(mp4kit.mp4_write(32, 16, 4, 20, [b"x" * 32] * 4)), "mp4"),
        ("v_avi", bytearray(avikit.avi_encode(frames, fps=10, quality=90)), "avi"),
        ("v_y4m", bytearray(videokit.y4m_encode(frames, fps=10)), "y4m"),
        ("bad", bytearray(b"truncated garbage"), "mp4"),
        ("unk", bytearray(b"????"), "webp"),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = {r.media_id: r for r in media_probe(df).collect()}

    assert got["a_mp3"].ok and got["a_mp3"].kind == "audio"
    assert (got["a_mp3"].n_frames, got["a_mp3"].samplerate,
            got["a_mp3"].bitrate_kbps) == (24, 44100, 128)
    assert got["a_wav"].ok and got["a_wav"].duration_ms == 800 * 1000 // 16000
    assert got["a_wav"].bitrate_kbps == 256  # 16 kHz * 16-bit mono PCM
    assert got["a_ima"].ok and got["a_ima"].duration_ms == 800 * 1000 // 16000
    assert got["v_mp4"].ok and (got["v_mp4"].w, got["v_mp4"].h) == (32, 16)
    assert (got["v_mp4"].n_frames, got["v_mp4"].fps) == (4, 20)
    assert got["v_avi"].ok and (got["v_avi"].n_frames, got["v_avi"].fps) == (2, 10)
    assert got["v_y4m"].ok and (got["v_y4m"].w, got["v_y4m"].h) == (16, 16)
    assert not got["bad"].ok and got["bad"].w is None
    assert not got["unk"].ok  # no prober for webp: honest null row
