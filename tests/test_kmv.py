"""operators/sketch.py KMV bottom-k sketch: the two-level salt prune
returns exactly the k smallest hashes, estimates are accurate and exact
below k, and sketches merge correctly (k-min of union from sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from europarl_crawler_spark.functions import porthash
from europarl_crawler_spark.operators.sketch import (
    KMV_K,
    KMV_MEMBER,
    kmv_sketch,
    kmv_stats,
)


def _py_hash(key) -> int:
    h = porthash.poly_hash_py(str(key))
    a, b = porthash.AFFINE_A[KMV_MEMBER], porthash.AFFINE_B[KMV_MEMBER]
    return (a * h + b) % porthash.P


def _df(spark, keys, set_id="S"):
    return spark.createDataFrame(
        [(set_id, k) for k in keys], "set_id string, key long"
    )


def test_salt_prune_returns_exactly_k_smallest(spark):
    keys = list(range(1, 2001))
    got = sorted(
        r.h for r in kmv_sketch(_df(spark, keys), "key", "set_id", k=64).collect()
    )
    want = sorted({_py_hash(k) for k in keys})[:64]
    assert got == want


def test_small_set_sketch_is_exact(spark):
    keys = [1, 2, 3, 4, 5]
    st = kmv_stats(
        kmv_sketch(_df(spark, keys), "key", "set_id"), k=KMV_K
    ).first()
    assert st.size == 5 and st.est == 5  # sketch holds the whole set


def test_estimate_accuracy_within_20pct(spark):
    n = 5000
    st = kmv_stats(
        kmv_sketch(_df(spark, range(n)), "key", "set_id"), k=KMV_K
    ).first()
    assert st.size == KMV_K
    assert abs(st.est - n) / n < 0.20  # k=128 → ~9% std error


def test_union_sketch_from_sketches_equals_direct(spark):
    a, b = list(range(0, 3000)), list(range(1500, 4500))
    sk = kmv_sketch(
        _df(spark, a, "A").unionByName(_df(spark, b, "B")), "key", "set_id", k=64
    )
    # k smallest of the UNION of the two sketches (mergeability)
    merged = sorted(
        r.h for r in sk.select("h").distinct().orderBy("h").limit(64).collect()
    )
    direct = sorted({_py_hash(k) for k in set(a) | set(b)})[:64]
    assert merged == direct


def test_jaccard_numerator_tracks_true_overlap(spark):
    a, b = list(range(0, 3000)), list(range(1500, 4500))  # Jaccard = 1/3
    tagged = _df(spark, a, "A").unionByName(_df(spark, b, "B"))
    all3 = tagged.unionByName(
        tagged.select(F.lit("U").alias("set_id"), "key")
    )
    sk = kmv_sketch(all3, "key", "set_id")
    u = sk.where(F.col("set_id") == "U").select("h")
    ka = sk.where(F.col("set_id") == "A").select("h")
    kb = sk.where(F.col("set_id") == "B").select("h")
    jn = u.join(ka, "h", "left_semi").join(kb, "h", "left_semi").count()
    assert abs(jn / KMV_K - 1 / 3) < 0.15


def test_streaming_kmv_equals_batch_under_splits(spark, tmp_path):
    import os

    from europarl_crawler_spark.streaming.sketchstream import drain_kmv_sketch

    keys = [(("A" if k % 3 else "B"), str(k * 17)) for k in range(3000)]
    src = str(tmp_path / "keys")
    spark.createDataFrame(keys, "set_id string, key string").repartition(
        5
    ).write.parquet(src)
    got = sorted(
        (r.set_id, r.h)
        for r in drain_kmv_sketch(
            spark, src, str(tmp_path / "ck"), "kmv_s1", k=64
        ).collect()
    )
    batch = sorted(
        (r.set_id, r.h)
        for r in kmv_sketch(
            spark.createDataFrame(keys, "set_id string, key string"),
            "key",
            "set_id",
            k=64,
        ).collect()
    )
    assert got == batch
