"""Pure-numpy image codecs + perceptual hash for the image+caption payload.

The reference's extraction stage parses HTML/PDF text (reference:
europarl/rules/extraction.py:27-52); per BASELINE.json `input_hint` the rebuild
replaces it with image+caption extraction over rows of
(image_id, bytes, w, h, fmt, caption, phash). No image library is available in
the sandbox, so three formats are implemented in numpy and used inside
Arrow-vectorized UDFs (never row-at-a-time Python on the data path):

- ``raw``  : w*h*3 uint8 RGB, row-major — lossless.
- ``ppm``  : binary PPM ("P6\\n{w} {h}\\n255\\n" + raw) — lossless, a real
             public format so external tools can read dumps.
- ``qraw`` : 6-bit/channel uniform quantization (step 4) — the *lossy* lane.
             Max per-channel error ≤ 2 ⇒ MSE ≤ 4²/12 ≈ 1.33 ⇒
             PSNR ≥ 10·log10(255²/1.33) ≈ 46.9 dB ≥ 40 dB by construction,
             satisfying the input_hint invariant (decoded-pixel allclose with
             PSNR ≥ 40 dB for lossy formats).

``phash64`` is the classic 8×8-DCT perceptual hash (32×32 grayscale → DCT-II →
top-left 8×8 minus DC → sign vs median → 64-bit int), all numpy matmuls so it
vectorizes across an Arrow batch.
"""

from __future__ import annotations

import numpy as np

FORMATS = ("raw", "ppm", "qraw")
LOSSLESS = frozenset({"raw", "ppm"})


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → payload bytes."""
    h, w, c = pixels.shape
    assert c == 3, "RGB only"
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if fmt == "raw":
        return px.tobytes()
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    if fmt == "qraw":
        # round-to-nearest 6-bit quantization: q = round(px * 63/255) ∈ 0..63
        q = ((px.astype(np.uint32) * 63 + 127) // 255).astype(np.uint8)
        return q.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes → (h, w, 3) uint8 pixels."""
    if fmt == "raw":
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "ppm":
        # header is self-describing; trust it but cross-check against (w, h)
        parts = payload.split(b"\n", 3)
        assert parts[0] == b"P6", "bad PPM magic"
        pw, ph = (int(x) for x in parts[1].split())
        assert (pw, ph) == (w, h), "PPM header/metadata mismatch"
        return np.frombuffer(parts[3], dtype=np.uint8).reshape(h, w, 3)
    if fmt == "qraw":
        q = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
        # inverse: round(q * 255/63) — matched to the encoder so max
        # per-channel error ≤ ceil((255/63)/2) = 3 and MSE ≈ (255/63)²/12
        return ((q.astype(np.uint32) * 255 + 31) // 63).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# perceptual hash
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
        m[0, :] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (32, 32) float64 grayscale via block-mean resize."""
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    # nearest-neighbour index resize — deterministic, cheap, good enough for a
    # perceptual hash (we only need stability, not visual fidelity)
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    return g[np.ix_(yi, xi)]


def phash64(pixels: np.ndarray) -> int:
    """Signed 64-bit perceptual hash (int64 range, storable in a Spark long)."""
    m = _dct_matrix()
    d = m @ _to_gray32(pixels) @ m.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term for the median
    bits = (block > med).astype(np.uint64)
    acc = np.uint64(0)
    for b in bits:
        acc = np.uint64(acc << np.uint64(1)) | b
    return int(acc.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
