"""MPEG-1 Layer III codec (functions/mp3codec.py) — pure-Python tests plus
the Spark wiring (audio features / fingerprints over decoded mp3).

The load-bearing property is the EXACT spectral round trip through the real
bitstream: side-info layout, Huffman table 1 with sign bits, and
part2_3_length accounting all sit between the encoder's integers and the
decoder's — a one-bit defect anywhere shifts every following codeword.
PCM is covered by structural invariants (length, finiteness, linearity,
silence) that hold for ANY correct synthesis window, matching the module's
declared Table-D boundary.
"""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import mp3codec, mp3kit


def _spec(n_frames: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    s = np.zeros((n_frames, 2, 576), dtype=np.int64)
    s[:, :, :64] = rng.integers(-1, 2, size=(n_frames, 2, 64))
    return s


def test_spectral_round_trip_exact():
    spec = _spec(4)
    dec = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(spec))
    assert np.array_equal(dec["spectra"], spec)
    assert dec["n_frames"] == 4
    assert dec["samplerate"] == 44100
    assert dec["samples"].shape == (4 * 1152,)
    assert np.all(np.isfinite(dec["samples"]))


def test_probe_sees_genuine_frames():
    body = mp3codec.mp3_encode_spectra(_spec(3), bitrate_kbps=128)
    p = mp3kit.mp3_probe(body)
    assert p["n_frames"] == 3
    assert p["samplerate"] == 44100
    assert p["channels"] == 1
    assert p["bitrate_kbps"] == 128
    assert not p["vbr"]


def test_frame_length_matches_spec_formula():
    body = mp3codec.mp3_encode_spectra(_spec(2))
    assert len(body) == 2 * (144 * 128000 // 44100)


def test_id3v2_tag_skipped():
    body = mp3codec.mp3_encode_spectra(_spec(1))
    tag = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    dec = mp3codec.mp3_decode(tag + body)
    assert dec["n_frames"] == 1


def test_silence_encodes_and_decodes_to_silence():
    spec = np.zeros((2, 2, 576), dtype=np.int64)
    dec = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(spec))
    assert np.array_equal(dec["spectra"], spec)
    assert np.all(dec["samples"] == 0.0)


def test_filterbank_linearity():
    """The whole decode path after requantization is linear, so negating the
    spectrum must negate the PCM exactly — catches sign/butterfly defects
    independent of the synthesis window choice."""
    spec = _spec(1, seed=3)
    a = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(spec))["samples"]
    b = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(-spec))["samples"]
    assert np.allclose(a, -b, atol=0, rtol=0)


def test_truncated_frame_rejected():
    body = mp3codec.mp3_encode_spectra(_spec(2))
    with pytest.raises(ValueError):
        mp3codec.mp3_decode(body[: len(body) - 50])


def test_garbage_rejected():
    with pytest.raises(ValueError):
        mp3codec.mp3_decode(b"\x00" * 400)


def test_global_gain_scales_pcm():
    spec = _spec(1, seed=5)
    lo = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(spec, global_gain=210))
    hi = mp3codec.mp3_decode(mp3codec.mp3_encode_spectra(spec, global_gain=214))
    assert np.array_equal(lo["spectra"], hi["spectra"])  # gain is post-Huffman
    assert np.allclose(hi["samples"], 2.0 * lo["samples"], rtol=1e-12)


def test_unsupported_profiles_fail_loudly():
    body = bytearray(mp3codec.mp3_encode_spectra(_spec(1)))
    # flip channel mode to stereo (bits 6-7 of byte 3): decoder must refuse
    body[3] &= 0b00111111
    with pytest.raises(ValueError, match="mono"):
        mp3codec.mp3_decode(bytes(body))


# ---- Spark wiring ----------------------------------------------------------


def _mp3_audio_df(spark, n=8):
    import pandas as pd

    rows = [
        ("a%02d" % i, bytearray(mp3codec.mp3_encode_spectra(_spec(1, seed=i))), "mp3")
        for i in range(n)
    ]
    # one exact duplicate pair for the near-pairs lane
    rows.append(("dup", rows[0][1], "mp3"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])
    )


def test_audio_features_decodes_mp3(spark):
    from europarl_crawler_spark.operators.multimodal import audio_features

    out = {r.audio_id: r for r in audio_features(_mp3_audio_df(spark)).collect()}
    assert out["a00"].n_samples == 1152
    assert out["a00"].framerate == 44100
    assert out["a00"].rms is not None and out["a00"].rms > 0


def test_audio_fingerprints_and_pairs_on_decoded_mp3(spark):
    from europarl_crawler_spark.operators import audiodup

    df = _mp3_audio_df(spark)
    fp = {r.audio_id: r.hash64 for r in audiodup.audio_fingerprints(df).collect()}
    assert len(fp) == 9  # every mp3 row decoded
    assert fp["dup"] == fp["a00"]  # identical bytes → identical fingerprint
    pairs = audiodup.audio_near_pairs(df, max_hamming=0).collect()
    assert any({p.id_a, p.id_b} == {"a00", "dup"} for p in pairs)
