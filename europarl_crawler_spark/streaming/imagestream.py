"""Streaming image near-duplicate detection: banded hamming LSH as a
STATEFUL streaming operator (``applyInPandasWithState``).

Batch near-dup (operators/imagedup.py) answers "which pairs exist in this
corpus"; a 100 TB ingest pipeline also needs the ONLINE form — "is this
newly crawled image a near-dup of anything seen so far" — without
re-scanning the corpus per micro-batch. This module keeps the banded-LSH
bucket membership as Spark streaming state:

- every incoming (id, hash64) row is exploded into its ``max_hamming + 1``
  band pieces (the SAME pigeonhole banding as the batch plan — a pair
  within hamming k agrees exactly on ≥1 band, so per-bucket state sees
  every true pair);
- each (band, piece) group holds its member list as group state; a new
  member is verified exactly (xor popcount) against the bucket's members —
  state members from prior micro-batches AND earlier rows of this batch —
  and emits its near-pairs at arrival time;
- a pair is emitted only when its LATER member arrives, so no pair is
  emitted in two different micro-batches; within one batch the same pair
  can surface from several agreeing bands — per-batch ``dropDuplicates``
  (or a distinct in the drain) makes the pair stream exactly-once.

Determinism: the TOTAL pair set over any prefix of the stream equals the
batch ``hamming_near_pairs`` over the same rows, REGARDLESS of how rows are
split into micro-batches — which is what lets the streaming lane share the
batch lane's DuckDB oracle verbatim (``dedup_image_pairs_streaming``).

Scale note: per-bucket state grows with bucket population. ``bucket_cap``
bounds it — a saturated bucket keeps verifying new arrivals against its
retained members but stops retaining, trading recall (only vs members
beyond the cap, only in that band) for bounded state; the cap is OFF by
default so the operator is exact, and production ingest picks a cap the
way it picks the LSH band width. Reference analog: the URL-seen set the
reference consults per crawled URL (SURVEY J2) — same shape, hash-keyed
membership state consulted at arrival time.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_MASK64 = (1 << 64) - 1

_PAIR_OUT = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("hamming", T.IntegerType(), False),
    ]
)
_BUCKET_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("hashes", T.ArrayType(T.LongType()), False),
    ]
)


def _hamming64(a: int, b: int) -> int:
    return ((a ^ b) & _MASK64).bit_count()


def _bucket_fn(max_hamming: int, bucket_cap: int | None):
    """Builds the per-(band, piece) stateful update function."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, hashes = state.get
            ids, hashes = list(ids), list(hashes)
        else:
            ids, hashes = [], []
        seen = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        out_d: list[int] = []
        for pdf in pdfs:
            for i, h in zip(pdf["_id"], pdf["_h"]):
                i, h = int(i), int(h)
                if i in seen:
                    continue  # replayed / duplicate id: already a member
                for j, g in zip(ids, hashes):
                    d = _hamming64(h, g)
                    if d <= max_hamming:
                        out_a.append(min(i, j))
                        out_b.append(max(i, j))
                        out_d.append(d)
                if bucket_cap is None or len(ids) < bucket_cap:
                    ids.append(i)
                    hashes.append(h)
                    seen.add(i)
        state.update((ids, hashes))
        yield pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "hamming": pd.Series(out_d, dtype="int32"),
            }
        )

    return fn


def streaming_near_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "hash64",
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id, hash64) STREAM → near-dup pair stream (id_a, id_b, hamming),
    id_a < id_b. Same banding expression as the batch
    ``imagedup.hamming_near_pairs``; membership lives in streaming state.
    Pairs may repeat within a micro-batch (several agreeing bands) — never
    across micro-batches; dedup per batch downstream."""
    nb = max_hamming + 1
    width = 64 // nb
    bands = F.array(*[F.lit(i) for i in range(nb)])
    keyed = (
        sig.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
        .withColumn("band", F.explode(bands))
        .withColumn(
            "piece",
            F.expr(f"shiftrightunsigned(_h, band * {width}) & {(1 << width) - 1}"),
        )
    )
    return keyed.groupBy("band", "piece").applyInPandasWithState(
        _bucket_fn(max_hamming, bucket_cap),
        outputStructType=_PAIR_OUT,
        stateStructType=_BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_near_pairs(
    spark: SparkSession,
    sig_dir: str,
    checkpoint: str,
    name: str,
    max_hamming: int = 3,
    schema: str = "doc_id long, hash64 long",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream (doc_id, hash64) Parquet → stateful near-dup pairs →
    memory sink, availableNow (one micro-batch per ``max_files_per_trigger``
    files — the bounded drain used by tests and the oracle query). Returns
    the DISTINCT pair set as a batch DataFrame."""
    from .stream import run_available_now

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sig_dir)
    )
    pairs = streaming_near_pairs(sdf, max_hamming=max_hamming)
    run_available_now(pairs, name, checkpoint, output_mode="update")
    return spark.table(name).select("id_a", "id_b", "hamming").distinct()
