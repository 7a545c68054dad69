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
size) up to ``group_cap``; beyond the cap a pathological hash group stops
retaining exact ids and tracks membership in a FIXED-SIZE Bloom sketch
(256 bytes, k=4), so state stays bounded while replays of evicted members
are still recognized with high probability. The exactness contract is
therefore two-tier, and the output says which tier a row is on
(``capped`` column):

* uncapped groups (``capped=false``): n_dups and keeper are exact and
  fully replay-idempotent — bit-equal to the batch GROUP BY.
* capped groups (``capped=true``): keeper stays exact (min is maintained
  incrementally) and n_dups is exact under at-most-once delivery; under
  replays it is exact up to the sketch's false-positive rate, whose only
  failure mode is UNDERCOUNT of a genuinely-new member (fp grows with the
  number of beyond-cap inserts — ~1e-6 at 100 beyond-cap members, ~1% at
  500; size the cap so capped groups are the pathological tail, not the
  norm). Downstream exact-count consumers must treat capped rows as lower
  bounds — which is what a dedup verdict needs (the group is enormous
  either way).
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
        T.StructField("capped", T.BooleanType(), False),
    ]
)
_GROUP_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("keep_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        # beyond-cap membership sketch; NULL until the group hits group_cap
        T.StructField("sketch", T.BinaryType(), True),
    ]
)

_BLOOM_BYTES = 256  # 2048 bits — fixed beyond-cap state per capped group
_BLOOM_BITS = _BLOOM_BYTES * 8
_BLOOM_K = 4
_MASK64 = (1 << 64) - 1


def _bloom_positions(i: int) -> list[int]:
    """k deterministic bit positions for an int64 id (splitmix64 finalizer →
    double hashing) — pure arithmetic, identical on every executor/run."""
    x = (i * 0x9E3779B97F4A7C15) & _MASK64
    x ^= x >> 29
    x = (x * 0xBF58476D1CE4E5B9) & _MASK64
    x ^= x >> 32
    h1 = x % _BLOOM_BITS
    h2 = ((x >> 13) % _BLOOM_BITS) | 1  # odd → full-period stride
    return [(h1 + j * h2) % _BLOOM_BITS for j in range(_BLOOM_K)]


def _bloom_has(sketch: bytearray, pos: list[int]) -> bool:
    return all(sketch[p >> 3] & (1 << (p & 7)) for p in pos)


def _bloom_add(sketch: bytearray, pos: list[int]) -> None:
    for p in pos:
        sketch[p >> 3] |= 1 << (p & 7)


def _group_fn(group_cap: int | None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, keep, n, sketch = state.get
            ids = list(ids)
            sketch = bytearray(sketch) if sketch is not None else None
        else:
            ids, keep, n, sketch = [], None, 0, None
        seen = set(ids)
        changed = False
        for pdf in pdfs:
            for i in pdf["_id"]:
                i = int(i)
                if i in seen:
                    continue  # replayed row: exact member
                pos = None
                if sketch is not None:
                    pos = _bloom_positions(i)
                    if _bloom_has(sketch, pos):
                        continue  # replayed evicted member (w.h.p.)
                n += 1
                keep = i if keep is None else min(keep, i)
                if group_cap is None or len(ids) < group_cap:
                    ids.append(i)
                    seen.add(i)
                else:
                    if sketch is None:
                        sketch = bytearray(_BLOOM_BYTES)
                        pos = _bloom_positions(i)
                    _bloom_add(sketch, pos)
                changed = True
        state.update((ids, keep, n, bytes(sketch) if sketch is not None else None))
        if changed:
            yield pd.DataFrame(
                {
                    "content_hash": pd.Series([int(key[0])], dtype="int64"),
                    "keep_id": pd.Series([keep], dtype="int64"),
                    "n_dups": pd.Series([n], dtype="int64"),
                    "capped": pd.Series([sketch is not None], dtype="bool"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "content_hash": pd.Series([], dtype="int64"),
                    "keep_id": pd.Series([], dtype="int64"),
                    "n_dups": pd.Series([], dtype="int64"),
                    "capped": pd.Series([], dtype="bool"),
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
    (content_hash, keep_id, n_dups, capped), re-emitted whenever a group
    gains members. The LAST summary per hash over any prefix equals the
    batch GROUP BY over the same rows — drain with max-n-per-hash.
    ``capped`` marks groups whose membership crossed ``group_cap`` and is
    now sketch-tracked: their n_dups is a lower bound under replays (see
    module docstring for the two-tier exactness contract)."""
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
