"""Structured Streaming: windowed counts w/ watermark, stateful politeness."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.sources.schema import REQUESTS
from europarl_crawler_spark.streaming import stream as S


@pytest.fixture(scope="module")
def requests_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("reqstream")
    rows = []
    for i in range(200):
        host = 1 if i % 2 == 0 else 2
        status = [200, 404, 503, 200][i % 4] if host == 1 else [200, 429][i % 2]
        rows.append(
            (
                i, i, i, host,
                datetime(2024, 1, 1, i % 24, (i * 7) % 60),
                status, None, 1, i + 1,
            )
        )
    spark.createDataFrame(rows, REQUESTS).write.parquet(str(root / "requests"))
    return str(root / "requests"), str(root)


def test_windowed_status_counts(spark, requests_dir):
    path, root = requests_dir
    sdf = S.windowed_status_counts(S.requests_stream(spark, path), "1 hour")
    S.run_available_now(sdf, "wincounts", root + "/ckpt1", output_mode="append")
    # append-mode output only emits closed windows; re-read as batch to check
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("requested_at", "1 hour"), "status_code")
        .count()
    )
    got = spark.sql("SELECT * FROM wincounts")
    # watermark holds back the final window in append mode: emitted ⊆ batch
    assert got.count() <= batch.count()
    joined = got.join(
        batch.select(
            F.col("window.start").alias("window_start"),
            "status_code",
            F.col("count").alias("n_batch"),
        ),
        ["window_start", "status_code"],
    )
    assert joined.count() == got.count()
    assert joined.filter(F.col("n") != F.col("n_batch")).count() == 0


def test_stateful_politeness(spark, requests_dir):
    path, root = requests_dir
    sdf = S.politeness_query(S.requests_stream(spark, path))
    S.run_available_now(sdf, "politeness", root + "/ckpt2", output_mode="update")
    rows = {r.host_hash: r for r in spark.sql(
        "SELECT * FROM politeness"
    ).collect()}
    # host 1 saw 503 (server error) → throttled at least once: interval > min
    # host 2 saw 429 (rate limit) → throttled
    assert rows[1].interval_secs > 3.0 or rows[2].interval_secs > 3.0
    for r in rows.values():
        assert r.n_events > 0


def test_foreach_batch_merge_replay_idempotent(spark, requests_dir, tmp_path):
    """A redelivered micro-batch (same batch id, the sink-committed-but-
    checkpoint-didn't-advance crash window) must leave the store unchanged —
    its epoch is already on the chain, so the replay is a no-op skip (the
    Iceberg foreachBatch pattern; ADVICE r1) — and must not open a new
    epoch. Committed epochs are immutable under the parent-CAS commit."""
    from europarl_crawler_spark.sources.epochstore import EpochStore

    path, _ = requests_dir
    store = EpochStore(tmp_path / "store")
    df = spark.read.parquet(path).select("request_id", "host_hash", "status_code")

    sink = S.batch_merge_sink(store, "reqmerge", ["request_id"])
    sink(df, 0)
    epochs_first = [m["epoch"] for m in store.manifests("reqmerge")]
    n_first = store.read("reqmerge", spark).count()
    sink(df, 0)  # redelivery of the same batch id
    assert [m["epoch"] for m in store.manifests("reqmerge")] == epochs_first
    assert store.read("reqmerge", spark).count() == n_first
    sink(df.limit(10), 1)  # next batch opens the next epoch
    assert [m["epoch"] for m in store.manifests("reqmerge")] == epochs_first + [
        epochs_first[-1] + 1
    ]
