"""Codec invariants: lossless roundtrip, qraw PSNR ≥ 40 dB (input_hint), phash."""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging


def _img(seed: int, w: int = 32, h: int = 16) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "ppm"])
def test_lossless_roundtrip(fmt):
    px = _img(1)
    out = imaging.decode(imaging.encode(px, fmt), 32, 16, fmt)
    assert np.array_equal(px, out)
    assert imaging.psnr(px, out) == float("inf")


def test_qraw_psnr_at_least_40db():
    # worst-case-ish content: uniform noise across the full range
    for seed in range(10):
        px = _img(seed, 64, 64)
        out = imaging.decode(imaging.encode(px, "qraw"), 64, 64, "qraw")
        assert imaging.psnr(px, out) >= 40.0
        assert np.max(np.abs(px.astype(int) - out.astype(int))) <= 3


def test_qraw_extremes_preserved():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[0] = 255
    out = imaging.decode(imaging.encode(px, "qraw"), 8, 8, "qraw")
    assert out[0, 0, 0] == 255 and out[1, 0, 0] == 0


def test_ppm_header():
    px = _img(2, 8, 4)
    payload = imaging.encode(px, "ppm")
    assert payload.startswith(b"P6\n8 4\n255\n")
    with pytest.raises(AssertionError):
        imaging.decode(payload, 9, 4, "ppm")  # metadata mismatch caught


def test_phash_properties():
    px = _img(3, 64, 64)
    h1 = imaging.phash64(px)
    assert -(2**63) <= h1 < 2**63  # fits a Spark long
    assert h1 == imaging.phash64(px.copy())  # deterministic
    # small perturbation → small hamming distance; different image → large
    perturbed = px.copy()
    perturbed[::2] = np.clip(perturbed[::2].astype(int) + 2, 0, 255).astype(np.uint8)
    other = _img(4, 64, 64)
    assert imaging.hamming64(h1, imaging.phash64(perturbed)) <= 16
    assert imaging.hamming64(h1, imaging.phash64(other)) >= 10
