"""Audio near-dup lane (operators/audiodup.py): delta-sign fingerprint
semantics (invariances + hand computation), WAV round-trip fidelity, banded
pair recall at the production threshold, and non-wav skip."""

from __future__ import annotations

import numpy as np

from europarl_crawler_spark.operators import audiodup, multimodal


def _samples(key=0, n=200):
    rng = np.random.Generator(np.random.Philox(key=key))
    return rng.integers(-20000, 20000, size=n, dtype=np.int16)


def test_fingerprint64_matches_hand_computation():
    s = _samples(1)
    want = np.uint64(0)
    for i in range(64):
        if s[i + 1] > s[i]:
            want |= np.uint64(1) << np.uint64(i)
    assert audiodup.fingerprint64(s) == int(want.astype(np.int64))


def test_fingerprint64_invariances():
    """Delta signs survive positive gain and DC offset (the re-encode
    transforms that keep waveform shape); short clips wrap; empty is 0."""
    s = _samples(2).astype(np.int64)
    base = audiodup.fingerprint64(s)
    assert audiodup.fingerprint64(s * 2) == base  # gain
    assert audiodup.fingerprint64(s + 1000) == base  # DC offset
    short = np.array([1, 5, 3], dtype=np.int64)  # wraps mod 3
    got = np.uint64(audiodup.fingerprint64(short))
    for i in range(64):
        want_bit = short[(i + 1) % 3] > short[i % 3]
        assert bool((got >> np.uint64(i)) & np.uint64(1)) == bool(want_bit)
    assert audiodup.fingerprint64(np.array([], dtype=np.int64)) == 0


def test_audio_fingerprints_through_real_wav(spark):
    """The DataFrame lane decodes the REAL WAV container: fingerprints equal
    the direct sample fingerprint; non-wav rows drop."""
    s = _samples(3)
    body = multimodal.wav_encode(s, 16000)
    audios = spark.createDataFrame(
        [("a1", bytearray(body), "wav"), ("skip", bytearray(b"xx"), "mp3")],
        "audio_id string, bytes binary, fmt string",
    )
    got = {
        r["audio_id"]: r["hash64"]
        for r in audiodup.audio_fingerprints(audios).collect()
    }
    assert got == {"a1": audiodup.fingerprint64(s)}


def test_audio_near_pairs_production_threshold(spark):
    """At max_hamming=3: an identical copy pairs at 0; a lightly perturbed
    copy (2 flipped delta signs) pairs; an unrelated clip does not."""
    s = _samples(4)
    near = s.copy()
    # swap two adjacent samples twice -> flips at most a few delta bits
    near[10], near[11] = near[11], near[10]
    far = _samples(5)
    rows = spark.createDataFrame(
        [
            ("a", bytearray(multimodal.wav_encode(s, 8000)), "wav"),
            ("b", bytearray(multimodal.wav_encode(s, 8000)), "wav"),
            ("c", bytearray(multimodal.wav_encode(near, 8000)), "wav"),
            ("d", bytearray(multimodal.wav_encode(far, 8000)), "wav"),
        ],
        "audio_id string, bytes binary, fmt string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audiodup.audio_near_pairs(rows, max_hamming=3).collect()
    }
    assert got[("a", "b")] == 0
    assert ("a", "c") in got and got[("a", "c")] <= 3
    assert not any("d" in p for p in got)
