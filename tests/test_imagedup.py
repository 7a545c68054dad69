"""Image near-dup lane (operators/imagedup.py): integer ahash semantics,
perceptual locality, banded hamming pairs recall/precision, and the
end-to-end payload→decode→hash→pairs path over the real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging
from europarl_crawler_spark.operators import imagedup


def _img(key=0, h=16, w=16):
    rng = np.random.Generator(np.random.Philox(key=key))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ahash64_matches_hand_computation():
    px = _img(1)
    p = px.astype(np.int64)
    y = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
    total = int(y.sum())
    want = np.uint64(0)
    for i in range(8):
        for j in range(8):
            bs = int(y[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].sum())
            if 64 * bs > total:
                want |= np.uint64(1) << np.uint64(i * 8 + j)
    assert imagedup.ahash64(px) == int(want.astype(np.int64))


def test_ahash64_is_perceptual():
    """Small pixel perturbations move few bits; different images are far."""
    a = _img(2)
    b = a.copy()
    b[0, 0] = (int(b[0, 0, 0]) + 3) % 256  # nudge one pixel slightly
    d_near = bin(
        (np.uint64(imagedup.ahash64(a)) ^ np.uint64(imagedup.ahash64(b))).item()
    ).count("1")
    assert d_near <= 2
    c = _img(3)
    d_far = bin(
        (np.uint64(imagedup.ahash64(a)) ^ np.uint64(imagedup.ahash64(c))).item()
    ).count("1")
    assert d_far > 10


def test_ahash64_survives_png_roundtrip():
    px = _img(4)
    dec = imaging.decode(imaging.encode(px, "png"), 16, 16, "png")
    assert imagedup.ahash64(dec) == imagedup.ahash64(px)


def _hash_with_flips(base: int, flip_bits: list[int]) -> int:
    h = np.uint64(base)
    for b in flip_bits:
        h ^= np.uint64(1) << np.uint64(b)
    return int(h.astype(np.int64))


def test_hamming_near_pairs_recall_and_precision(spark):
    """Distances 0/1/3 found (incl. flips spread across 3 DIFFERENT bands —
    the pigeonhole worst case), distance 4 excluded."""
    base = 0x1234_5678_9ABC_DEF0
    rows = [
        ("d0", _hash_with_flips(base, [])),
        ("d1", _hash_with_flips(base, [])),            # dup of d0 → hamming 0
        ("d2", _hash_with_flips(base, [5])),           # hamming 1
        ("d3", _hash_with_flips(base, [2, 20, 40])),   # 3 flips in 3 bands
        ("d4", _hash_with_flips(base, [1, 17, 33, 49])),  # 4 flips, 4 bands
        ("d5", _hash_with_flips(base, [63])),          # sign-bit flip
    ]
    sig = spark.createDataFrame(rows, "doc_id string, hash64 long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in imagedup.hamming_near_pairs(sig, max_hamming=3).collect()
    }
    assert got[("d0", "d1")] == 0
    assert got[("d0", "d2")] == 1
    assert got[("d0", "d3")] == 3
    assert got[("d0", "d5")] == 1  # shiftrightunsigned handles the sign band
    assert ("d0", "d4") not in got  # hamming 4 > max
    assert got[("d2", "d5")] == 2


def test_hamming_near_pairs_plan_has_no_cartesian(spark):
    rows = [(f"d{i}", i * 1024) for i in range(20)]
    sig = spark.createDataFrame(rows, "doc_id string, hash64 long")
    plan = imagedup.hamming_near_pairs(sig)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_image_near_pairs_end_to_end(spark):
    """Payload bytes → real decode (png + jpeg) → phash → pairs: an exact
    re-encode of the same pixels in a LOSSLESS format must land at hamming 0;
    the same pixels through the lossy jpeg lane must still be near (the
    whole point of perceptual hashing); unrelated images must not pair.
    The shared image is smooth BROADBAND content (a mixture of low-frequency
    2-D cosines): phash needs DCT coefficients well away from the median to
    be stable — on pure noise or a separable gradient the many near-median
    coefficients flip under lossy re-encoding, which is a property of the
    content, not a defect this test should pin."""
    yy, xx = np.mgrid[0:16, 0:16]
    base = (
        128
        + 50 * np.cos(xx * 0.7) * np.cos(yy * 0.5)
        + 35 * np.sin(xx * 1.3 + yy * 0.9)
        + 25 * np.cos((xx + 2 * yy) * 0.4)
    )
    px = np.stack(
        [
            base.clip(0, 255),
            (base * 0.8 + 30 * np.sin(yy * 1.1)).clip(0, 255),
            (255 - base + 20 * np.cos(xx * 0.9)).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    other = _img(8)
    rows = [
        ("png_a", bytearray(imaging.encode(px, "png")), 16, 16, "png"),
        ("png_b", bytearray(imaging.encode(px, "png")), 16, 16, "png"),
        ("jpeg_a", bytearray(imaging.encode(px, "jpeg")), 16, 16, "jpeg"),
        ("other", bytearray(imaging.encode(other, "png")), 16, 16, "png"),
        ("broken", bytearray(b"\xff\xd8nope"), 16, 16, "jpeg"),
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in imagedup.image_near_pairs(
            images, max_hamming=10, kind="phash"
        ).collect()
    }
    assert got[("png_a", "png_b")] == 0
    assert ("jpeg_a", "png_a") in got or ("png_a", "jpeg_a") in got
    assert not any("other" in pair for pair in got)
    assert not any("broken" in pair for pair in got)


def test_hamming_near_pairs_block_cols(spark):
    """Coarse blocking keys restrict pair search to within-block rows — the
    documented 10⁹-scale selectivity lever."""
    base = 0x0F0F_1234_ABCD_9876
    rows = [
        ("s0", _hash_with_flips(base, []), "small"),
        ("s1", _hash_with_flips(base, [7]), "small"),
        ("l0", _hash_with_flips(base, []), "large"),  # near s0/s1, other block
        ("l1", _hash_with_flips(base, [9]), "large"),
    ]
    sig = spark.createDataFrame(rows, "doc_id string, hash64 long, size_class string")
    got = {
        (r.id_a, r.id_b)
        for r in imagedup.hamming_near_pairs(
            sig, max_hamming=3, block_cols=["size_class"]
        ).collect()
    }
    assert got == {("s0", "s1"), ("l0", "l1")}


def test_image_dup_groups_transitive_closure(spark):
    """A chain a~b~c (each hop within threshold, endpoints beyond it)
    clusters into ONE group labeled by the smallest id; isolated rows get no
    group row at all (nothing to dedup)."""
    base = 0x7777_0000_1111_2222
    rows = [
        ("a", _hash_with_flips(base, [])),
        ("b", _hash_with_flips(base, [3, 21])),          # ham(a,b)=2
        ("c", _hash_with_flips(base, [3, 21, 40, 55])),  # ham(b,c)=2, ham(a,c)=4
        ("z", _hash_with_flips(base, [0, 8, 16, 24, 32, 40, 48, 56])),
    ]
    sig = spark.createDataFrame(rows, "doc_id string, hash64 long")
    got = {
        r.doc_id: r.group_id
        for r in imagedup.image_dup_groups(sig, max_hamming=3).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_simhash_delegates_to_shared_banded_plan(spark):
    """The text simhash lane and the image lane share hamming_near_pairs —
    sanity-pin that the delegation preserves the simhash contract."""
    from europarl_crawler_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark partitions"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert not any(3 in pair for pair in got)
