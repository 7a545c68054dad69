"""Streaming crawl epochs (streaming/crawlstream.py): the drain→fetch→merge
loop driven by Structured Streaming must equal the batch epoch body over the
same frontier, and survive a replayed micro-batch unchanged (T8)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from europarl_crawler_spark.sources.epochstore import EpochStore
from europarl_crawler_spark.streaming.crawlstream import (
    drain_fetch_batch,
    stream_crawl_epochs,
)


def _frontier(spark, n=800):
    rng = np.random.Generator(np.random.Philox(key=41))
    ids = np.unique(rng.integers(-(2**62), 2**62, size=n, dtype=np.int64))
    return spark.createDataFrame(
        [(int(i), int(abs(i) % 7)) for i in ids], "url_id long, host long"
    )


def _write_batches(df, root, n_batches=4):
    import os
    import shutil

    flat = root / "flat"
    flat.mkdir()
    for b in range(n_batches):
        sub = str(root / f"b{b}")
        df.filter(F.pmod(F.col("url_id"), F.lit(n_batches)) == b).coalesce(
            1
        ).write.parquet(sub)
        for p in sorted(os.listdir(sub)):
            if p.endswith(".parquet"):
                shutil.copy(os.path.join(sub, p), flat / f"b{b}.parquet")
    return str(flat)


def test_streaming_equals_batch_epoch_body(spark, tmp_path):
    df = _frontier(spark)
    flat = _write_batches(df, tmp_path)
    store = EpochStore(tmp_path / "store")
    got = stream_crawl_epochs(
        spark, flat, store, checkpoint=str(tmp_path / "ckpt")
    )
    want = drain_fetch_batch(df, n_batches=4, budget=5)
    cols = ["url_id", "host", "batch", "drain_seq", "status_code", "dead_letter"]
    g = sorted(tuple(r) for r in got.select(cols).collect())
    w = sorted(tuple(r) for r in want.select(cols).collect())
    assert g == w and len(g) > 0
    # 4 micro-batches => 4 store epochs on the table's chain
    assert store.latest("requests_stream") == 4


def test_streaming_crawl_replay_is_noop(spark, tmp_path):
    """Two replay contracts: (1) re-running with the SAME checkpoint finds
    no new files and commits nothing — the true restart path; (2) a fresh
    checkpoint is a NEW query whose re-merge is value-idempotent (keyed
    MERGE of identical rows: the chain advances, the data doesn't)."""
    df = _frontier(spark, n=300)
    flat = _write_batches(df, tmp_path)
    store = EpochStore(tmp_path / "store")
    first = stream_crawl_epochs(
        spark, flat, store, checkpoint=str(tmp_path / "ckpt1")
    )
    rows1 = sorted(tuple(r) for r in first.collect())
    assert store.latest("requests_stream") == 4
    # (1) same checkpoint: availableNow drains zero new files, zero commits
    resumed = stream_crawl_epochs(
        spark, flat, store, checkpoint=str(tmp_path / "ckpt1")
    )
    assert sorted(tuple(r) for r in resumed.collect()) == rows1
    assert store.latest("requests_stream") == 4
    # (2) fresh checkpoint: every batch re-merges; values must not change
    again = stream_crawl_epochs(
        spark, flat, store, checkpoint=str(tmp_path / "ckpt2")
    )
    assert sorted(tuple(r) for r in again.collect()) == rows1
