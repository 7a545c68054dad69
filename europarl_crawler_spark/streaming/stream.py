"""Streaming view of the crawl: the requests log as an unbounded source.

The reference has no event-time processing (SURVEY T11) — its "streams" are
bounded multiprocessing queues. The rebuild exposes the natural streaming
surface a production crawler wants on top of the same tables:

- ``windowed_status_counts``: tumbling event-time windows + watermark over
  the requests log (late fetch records tolerated up to the watermark) — the
  streaming twin of the A1 status histogram.
- ``politeness_query``: a custom **stateful** operator via
  ``applyInPandasWithState`` — one TokenBucket state machine per host,
  updated by each micro-batch's status codes, emitting interval changes.
  This is the reference TokenBucketWorker (workers/tokenbucket.py) as a
  Spark stateful streaming operator.
- ``foreach_batch_merge``: sink adapter that MERGEs each micro-batch into an
  EpochStore table (idempotent by batch id — the Iceberg/foreachBatch
  exactly-once pattern).

All sources are file streams over the same Parquet layout the batch engine
writes, so batch and streaming share one storage format.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.politeness import (
    MIN_INTERVAL_SECS,
    THROTTLE_RATELIMIT,
    THROTTLE_SERVER_ERROR,
    UNTHROTTLE_OK,
    TokenBucket,
)
from ..sources.schema import REQUESTS


def requests_stream(spark: SparkSession, requests_dir: str) -> DataFrame:
    """File-source stream over request-log Parquet files (one file per epoch
    partition appended by the batch engine — the handoff point)."""
    return (
        spark.readStream.schema(REQUESTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(requests_dir)
    )


def windowed_status_counts(
    requests: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window per-status counts with late-data watermark."""
    return (
        requests.withWatermark("requested_at", watermark)
        .groupBy(F.window("requested_at", window).alias("win"), "status_code")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "status_code",
            "n",
        )
    )


_POLITENESS_OUT = T.StructType(
    [
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("interval_secs", T.DoubleType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)
_POLITENESS_STATE = T.StructType(
    [T.StructField("interval_secs", T.DoubleType(), False)]
)


def _politeness_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-host token-bucket state update from a micro-batch of requests.

    Mirrors TokenBucket.apply_throttling precedence exactly (reference
    workers/tokenbucket.py:80-100): rate-limit > server-error > success.
    """
    (host_hash,) = key
    if state.exists:
        (interval,) = state.get
    else:
        interval = MIN_INTERVAL_SECS
    tb = TokenBucket(interval_secs=float(interval))
    codes: set[int] = set()
    n = 0
    for pdf in pdfs:
        codes.update(int(c) for c in pdf["status_code"])
        n += len(pdf)
    tb.apply_throttling(sorted(codes))
    state.update((float(tb.interval_secs),))
    yield pd.DataFrame(
        {"host_hash": [host_hash], "interval_secs": [tb.interval_secs], "n_events": [n]}
    )


def politeness_query(requests: DataFrame) -> DataFrame:
    """Stateful per-host politeness stream (applyInPandasWithState)."""
    return (
        requests.select("host_hash", "status_code")
        .groupBy("host_hash")
        .applyInPandasWithState(
            _politeness_fn,
            outputStructType=_POLITENESS_OUT,
            stateStructType=_POLITENESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(sdf: DataFrame, name: str, checkpoint: str, output_mode: str = "update"):
    """Drain everything currently available into an in-memory table and stop —
    the bounded test/backfill trigger."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def batch_merge_sink(store, table: str, keys: list[str]):
    """foreachBatch sink: epoch = base + batch_id + 1 with ``base`` captured
    once at query start. If the sink commits but the checkpoint doesn't
    advance (the crash window), the redelivered batch's epoch is ALREADY on
    the manifest chain and the sink skips it — the Iceberg foreachBatch
    exactly-once pattern (check the last committed batch id, no-op the
    replay). A crash BEFORE the manifest landed leaves a manifest-less data
    dir; the replay then re-commits the epoch and clobbers the orphan.
    Committed epochs are immutable (``EpochStore._commit`` parent-CAS), so
    a replay can never fork or rewrite the chain."""
    base = store.latest(table) or 0

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        epoch = base + int(batch_id) + 1
        latest = store.latest(table)
        if latest is not None and epoch <= latest:
            return  # batch already durably committed — replay is a no-op
        store.merge(table, batch_df, epoch, keys=keys)

    return _sink


def foreach_batch_merge(sdf: DataFrame, store, table: str, keys: list[str], checkpoint: str):
    """Stream → EpochStore MERGE per micro-batch; the store epoch is derived
    from the streaming batch id (``base + batch_id + 1`` with base captured at
    query start), so a replayed micro-batch maps to an epoch that is either
    already committed (skip — the no-op replay of the Iceberg-foreachBatch
    exactly-once pattern) or aborted mid-write (re-commit clobbers the
    manifest-less orphan). Idempotent sink, T8."""
    return (
        sdf.writeStream.foreachBatch(batch_merge_sink(store, table, keys))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
