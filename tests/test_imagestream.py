"""Stateful streaming near-dup (streaming/imagestream.py): bucket state
persists across micro-batches, the drained pair set equals the batch
operator's regardless of batch split, and bucket_cap bounds state honestly."""

import numpy as np

from europarl_crawler_spark.operators import imagedup
from europarl_crawler_spark.streaming.imagestream import (
    _hamming64,
    drain_near_pairs,
    streaming_near_pairs,
)


def _sig_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, hash64 long")


def test_hamming64_signed_longs():
    assert _hamming64(-1, 0) == 64
    assert _hamming64(-1, -2) == 1
    assert _hamming64(5, 5) == 0


def test_state_persists_across_micro_batches(spark, tmp_path):
    """A arrives in file/batch 1, its near-dup B in file/batch 2 — the pair
    can only surface if bucket membership survived the batch boundary."""
    sig_dir = str(tmp_path / "sig")
    a = 0x0123456789ABCDEF
    b = a ^ (1 << 7)  # hamming 1 from a
    far = a ^ ((1 << 62) - 1)  # hamming 62 from a
    _sig_df(spark, [(1, a)]).coalesce(1).write.parquet(sig_dir)
    _sig_df(spark, [(2, b), (3, far)]).coalesce(1).write.mode("append").parquet(
        sig_dir
    )
    got = drain_near_pairs(
        spark, sig_dir, str(tmp_path / "ck"), "imgs_t1", max_hamming=3
    ).collect()
    pairs = {(r.id_a, r.id_b, r.hamming) for r in got}
    assert (1, 2, 1) in pairs
    assert all(3 not in (p[0], p[1]) for p in pairs)


def test_stream_equals_batch_operator(spark, tmp_path):
    """Split-invariance: the drained stream pair set == batch
    hamming_near_pairs over the same rows (4-file split, 4 micro-batches)."""
    def to_i64(u):
        u &= (1 << 64) - 1
        return u - (1 << 64) if u >= (1 << 63) else u

    rng = np.random.default_rng(42)
    base = [int(x) for x in rng.integers(0, 1 << 64, size=20, dtype=np.uint64)]
    rows = [(i, to_i64(u)) for i, u in enumerate(base)]
    # plant near-dups: ids 100+i = a 1-bit flip of id i
    for i in range(8):
        rows.append((100 + i, to_i64(base[i] ^ (1 << int(rng.integers(0, 64))))))
    sig = _sig_df(spark, rows)
    sig_dir = str(tmp_path / "sig")
    sig.repartition(4).write.parquet(sig_dir)

    streamed = drain_near_pairs(
        spark, sig_dir, str(tmp_path / "ck"), "imgs_t2", max_hamming=3
    ).collect()
    batch = imagedup.hamming_near_pairs(
        sig, max_hamming=3, id_col="doc_id", hash_col="hash64"
    ).collect()
    s = sorted((r.id_a, r.id_b, r.hamming) for r in streamed)
    b = sorted((r.id_a, r.id_b, r.hamming) for r in batch)
    assert s == b and len(s) >= 8


def test_bucket_cap_bounds_state_but_stays_sound(spark, tmp_path):
    """With a tiny bucket_cap the operator may miss pairs (documented
    recall trade) but every emitted pair is still a true near-dup."""
    rng = np.random.default_rng(7)
    h0 = int(rng.integers(-(2**62), 2**62))
    rows = [(i, h0 ^ (1 << (i % 2))) for i in range(12)]  # one dense bucket
    sig = _sig_df(spark, [(int(i), np.int64(h).item()) for i, h in rows])
    sig.coalesce(1).write.parquet(str(tmp_path / "sig"))
    sdf = (
        spark.readStream.schema("doc_id long, hash64 long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "sig"))
    )
    pairs = streaming_near_pairs(sdf, max_hamming=3, bucket_cap=2)
    from europarl_crawler_spark.streaming.stream import run_available_now

    run_available_now(pairs, "imgs_t3", str(tmp_path / "ck"), "update")
    got = spark.table("imgs_t3").distinct().collect()
    full = {
        (r.id_a, r.id_b)
        for r in imagedup.hamming_near_pairs(
            sig, max_hamming=3, id_col="doc_id", hash_col="hash64"
        ).collect()
    }
    emitted = {(r.id_a, r.id_b) for r in got}
    assert emitted and emitted <= full  # sound, possibly not complete
    assert len(emitted) < len(full)  # the cap actually bit on this bucket
