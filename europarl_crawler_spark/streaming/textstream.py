"""Streaming exact content-dedup: hash-keyed group membership as STATEFUL
streaming state (``applyInPandasWithState``).

Batch exact dedup (operators/dedup.py:exact_duplicates) answers "which
documents share a content hash in this corpus"; a 100 TB ingest pipeline
also needs the ONLINE form — "has this newly crawled document's content been
seen before, and who keeps it" — without re-scanning the corpus per
micro-batch. This is the content-side twin of the URL-seen set (SURVEY J2):
hash-keyed membership state consulted at arrival time, partitioned by the
hash itself so state scales horizontally and no group ever leaves its
executor.

Per content-hash group the state is the member-id list; every micro-batch
with new members emits the group's UPDATED summary (keeper = min id,
n_members). The final row per hash after any drain — whatever the
micro-batch split — equals the batch ``GROUP BY hash`` over the same rows,
which is what lets the streaming lane share a plain aggregate DuckDB oracle
(``dedup_exact_streaming``): take the max-n row per hash, keep groups with
n ≥ 2.

Replay safety: a member id already in state is ignored (idempotent under
source replays, like the batch MERGE sinks). State per group is O(group
size); ``group_cap`` bounds pathological hash groups (a capped group stops
retaining ids but keeps counting — n_members stays exact while memory stays
bounded; keeper is exact because min is maintained incrementally).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_GROUP_OUT = T.StructType(
    [
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("keep_id", T.LongType(), False),
        T.StructField("n_dups", T.LongType(), False),
    ]
)
_GROUP_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("keep_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def _group_fn(group_cap: int | None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, keep, n = state.get
            ids = list(ids)
        else:
            ids, keep, n = [], None, 0
        seen = set(ids)
        changed = False
        for pdf in pdfs:
            for i in pdf["_id"]:
                i = int(i)
                if i in seen:
                    continue  # replayed row: already a member
                n += 1
                keep = i if keep is None else min(keep, i)
                if group_cap is None or len(ids) < group_cap:
                    ids.append(i)
                    seen.add(i)
                changed = True
        state.update((ids, keep, n))
        if changed:
            yield pd.DataFrame(
                {
                    "content_hash": pd.Series([int(key[0])], dtype="int64"),
                    "keep_id": pd.Series([keep], dtype="int64"),
                    "n_dups": pd.Series([n], dtype="int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "content_hash": pd.Series([], dtype="int64"),
                    "keep_id": pd.Series([], dtype="int64"),
                    "n_dups": pd.Series([], dtype="int64"),
                }
            )

    return fn


def streaming_exact_dup_groups(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
    group_cap: int | None = None,
) -> DataFrame:
    """(id, content_hash) STREAM → per-group summary stream
    (content_hash, keep_id, n_dups), re-emitted whenever a group gains
    members. The LAST summary per hash over any prefix equals the batch
    GROUP BY over the same rows — drain with max-n-per-hash."""
    keyed = hashed.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    return keyed.groupBy("_h").applyInPandasWithState(
        _group_fn(group_cap),
        outputStructType=_GROUP_OUT,
        stateStructType=_GROUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_dup_groups(
    spark: SparkSession,
    hashed_dir: str,
    checkpoint: str,
    name: str,
    min_group: int = 2,
    schema: str = "doc_id long, content_hash long",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream (doc_id, content_hash) Parquet → stateful group summaries
    → memory sink, availableNow. Returns the FINAL group per hash (max
    n_dups — group summaries only ever grow) with n_dups ≥ min_group, as a
    batch DataFrame."""
    from .stream import run_available_now

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(hashed_dir)
    )
    groups = streaming_exact_dup_groups(sdf)
    run_available_now(groups, name, checkpoint, output_mode="update")
    drained = spark.table(name)
    final = drained.groupBy("content_hash").agg(
        F.max_by("keep_id", "n_dups").alias("keep_id"),
        F.max("n_dups").alias("n_dups"),
    )
    return final.filter(F.col("n_dups") >= min_group)
