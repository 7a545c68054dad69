"""Bloom filter: never a false negative; fpp in the right ballpark."""

from __future__ import annotations

import numpy as np

from europarl_crawler_spark.functions.seen import BloomFilter


def test_no_false_negatives():
    rng = np.random.Generator(np.random.Philox(key=7))
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bf = BloomFilter.sized(5000, fpp=0.01)
    bf.add_many(keys)
    assert bf.might_contain(keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.Generator(np.random.Philox(key=8))
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    bf = BloomFilter.sized(5000, fpp=0.01)
    bf.add_many(keys)
    fp = bf.might_contain(probe).mean()  # probes are ~all novel
    assert fp < 0.05


def test_union():
    a, b = BloomFilter.sized(100), BloomFilter.sized(100)
    a.add_many(np.array([1, 2, 3], dtype=np.int64))
    b.add_many(np.array([4, 5, 6], dtype=np.int64))
    u = a.union(b)
    assert u.might_contain(np.array([1, 6], dtype=np.int64)).all()
