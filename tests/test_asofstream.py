"""streaming/asofstream.py — online as-of enrichment: equivalence with the
batch operator under the time-ordered-arrival contract, state carry across
micro-batches, tie and no-match behavior."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from europarl_crawler_spark.operators.asof import asof_join
from europarl_crawler_spark.streaming.asofstream import (
    drain_asof,
    write_time_ordered,
)

T = dt.datetime


def _union(spark, controls, requests):
    r = spark.createDataFrame(
        [(0, 0, k, ts, v) for k, ts, v in controls],
        "side int, event_id long, user_id long, ts timestamp, value double",
    )
    l = spark.createDataFrame(
        [(1, eid, k, ts, None) for eid, k, ts in requests],
        "side int, event_id long, user_id long, ts timestamp, value double",
    )
    return r.unionByName(l)


def test_matches_batch_asof_across_microbatches(spark, tmp_path):
    controls = [
        (1, T(2024, 1, 1, 0, 0, 10), 5.0),
        (1, T(2024, 1, 1, 0, 0, 30), 7.0),  # lands in a LATER file
        (2, T(2024, 1, 1, 0, 0, 5), 9.0),
    ]
    requests = [
        (100, 1, T(2024, 1, 1, 0, 0, 20)),  # carry from batch 1
        (101, 1, T(2024, 1, 1, 0, 0, 40)),  # sees the later update
        (102, 2, T(2024, 1, 1, 0, 0, 4)),   # before any control → NULLs
        (103, 3, T(2024, 1, 1, 0, 0, 50)),  # key with no controls at all
        (104, 1, T(2024, 1, 1, 0, 0, 30)),  # tie: inclusive ≤
    ]
    src = str(tmp_path / "src")
    write_time_ordered(_union(spark, controls, requests), src, n_files=3)
    got = sorted(
        tuple(r)
        for r in drain_asof(
            spark, src, str(tmp_path / "ck"), "asof_t1"
        ).collect()
    )
    left = spark.createDataFrame(
        [(eid, k, ts) for eid, k, ts in requests],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        controls, "user_id long, ts timestamp, value double"
    )
    want = sorted(
        tuple(r)
        for r in asof_join(
            left, right, key="user_id", value_cols=["value"]
        ).collect()
    )
    assert got == want
    assert len(got) == len(requests)  # every request emitted exactly once


def test_tolerance_nulls_match_batch(spark, tmp_path):
    controls = [(1, T(2024, 1, 1), 5.0)]
    requests = [(1, 1, T(2024, 1, 1, 0, 1)), (2, 1, T(2024, 1, 1, 2, 0))]
    src = str(tmp_path / "src")
    write_time_ordered(_union(spark, controls, requests), src, n_files=2)
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in drain_asof(
            spark, src, str(tmp_path / "ck"), "asof_t2", tolerance_s=3600
        ).collect()
    }
    assert got[1] == (T(2024, 1, 1), 5.0)
    assert got[2] == (None, None)  # stale → nulled, row kept


def test_time_ordered_writer_is_ordered_and_complete(spark, tmp_path):
    controls = [(1, T(2024, 1, 1, 0, 0, s), float(s)) for s in range(10)]
    requests = [(200 + s, 1, T(2024, 1, 1, 0, 0, s)) for s in range(10)]
    src = str(tmp_path / "src")
    write_time_ordered(_union(spark, controls, requests), src, n_files=4)
    files = sorted(os.listdir(src))
    assert len(files) == 4
    # mtimes strictly increase with file index (the arrival-order contract)
    mtimes = [os.path.getmtime(os.path.join(src, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
    # no row lost or duplicated
    assert spark.read.parquet(src).count() == 20
    # per-file max ts never exceeds the next file's min ts
    bounds = [
        spark.read.parquet(os.path.join(src, f))
        .agg(F.min("ts"), F.max("ts"))
        .first()
        for f in files
    ]
    for (_, hi), (lo2, _) in zip(bounds[:-1], bounds[1:]):
        assert hi <= lo2
