"""ONLINE as-of enrichment — the streaming twin of operators/asof.py.

The crawl shape: a CONTROL stream (robots re-fetches, post-429 throttle
updates — the reference's downloader/worker backoff state) and a REQUEST
stream share a host key; every request must be judged against the latest
control state at-or-before its own timestamp. Batch answers it with the
union + running-window composition; online, the state IS the running
window's carry — the latest control row per key — so the operator is an
``applyInPandasWithState`` keyed by host with O(1) state per key:

    per micro-batch, per key: sort (control ∪ request) rows by
    (event time, side: control-first) — exactly the batch operator's
    ordering — walk once, carrying the latest control (ts, value) in
    and out of the group state; emit each request row with the carry.

CONTRACT (the honesty clause, like textstream's group_cap note): output
equals the batch as-of join iff each key's rows arrive EVENT-TIME-ORDERED
ACROSS micro-batches (any order within a batch is fine — the walk sorts).
That is the CDC-log assumption: a control update older than an
already-emitted request can't retroactively fix the past — a batch
recompute can, a stream cannot. The drain helper therefore splits its
input into time-ordered files; the lane's oracle is the SAME DuckDB ASOF
JOIN as the batch lane, making the equivalence a checked value, not a
claim.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: carry = the latest control row seen for this key: (ts epoch-µs, value)
_STATE = T.StructType(
    [
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("asof_ts", T.TimestampType(), True),
        T.StructField("asof_value", T.DoubleType(), True),
    ]
)


def _asof_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts_us, last_v = state.get
    else:
        last_ts_us, last_v = None, None
    batch = pd.concat(list(pdfs), ignore_index=True)
    # the batch operator's exact ordering: event time, control before
    # request on ties (inclusive ≤), then event_id for determinism
    batch = batch.sort_values(["ts", "side", "event_id"], kind="mergesort")
    out_rows = []
    uid = int(key[0])
    for ts, side, eid, val in zip(
        batch["ts"], batch["side"], batch["event_id"], batch["value"]
    ):
        if side == 0:  # control update: advance the carry
            last_ts_us = int(pd.Timestamp(ts).value // 1000)
            last_v = float(val)
        else:  # request: emit with the carry
            out_rows.append(
                (
                    int(eid),
                    uid,
                    ts,
                    None
                    if last_ts_us is None
                    else pd.Timestamp(last_ts_us * 1000),
                    last_v,
                )
            )
    if last_ts_us is not None:
        state.update((last_ts_us, float(last_v)))
    yield pd.DataFrame(
        out_rows, columns=["event_id", "user_id", "ts", "asof_ts", "asof_value"]
    )


def streaming_asof(union_stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """(side 0=control/1=request, event_id, key, ts, value) STREAM →
    enriched request stream. Append mode: each request is emitted exactly
    once, in the micro-batch it arrives."""
    return union_stream.groupBy(key_col).applyInPandasWithState(
        _asof_fn,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_asof(
    spark: SparkSession,
    src_dir: str,
    checkpoint: str,
    name: str,
    tolerance_s: int | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream the prepared union (written time-ordered by
    ``write_time_ordered``) → stateful as-of → memory sink, availableNow.
    ``tolerance_s`` post-filters stale matches to NULL exactly like the
    batch operator, so the lane can share its oracle verbatim."""
    from .stream import run_available_now

    sdf = (
        spark.readStream.schema(
            "side int, event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    run_available_now(streaming_asof(sdf), name, checkpoint, output_mode="append")
    out = spark.table(name)
    if tolerance_s is not None:
        fresh = (
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
        ) <= F.lit(int(tolerance_s))
        out = out.select(
            "event_id",
            "user_id",
            "ts",
            F.when(fresh, F.col("asof_ts")).alias("asof_ts"),
            F.when(fresh, F.col("asof_value")).alias("asof_value"),
        )
    return out


def write_time_ordered(df: DataFrame, dest: str, n_files: int = 4) -> None:
    """Materialize the union input as ``n_files`` parquet files covering
    CONTIGUOUS, INCREASING time ranges, with strictly increasing mtimes —
    the event-time-ordered arrival the operator's contract requires
    (Spark's file source picks up files in modification-time order).

    TEST/LANE FIXTURE ONLY (driver-side materialization): in production
    the ordered source is the real CDC log / Kafka partition, which
    already delivers per-key event-time order — nothing is collected."""
    import os
    import time

    rows = df.toPandas().sort_values(["ts", "side", "event_id"], kind="mergesort")
    parts = [len(rows) * i // n_files for i in range(n_files + 1)]
    os.makedirs(dest, exist_ok=True)
    now = time.time()
    for i in range(n_files):
        chunk = rows.iloc[parts[i] : parts[i + 1]]
        path = os.path.join(dest, f"part-{i:04d}.parquet")
        # µs timestamps: Spark reads TIMESTAMP_MICROS; pandas' default
        # nanosecond INT64 is not a Spark timestamp
        chunk.to_parquet(
            path,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(path, (now + i, now + i))
