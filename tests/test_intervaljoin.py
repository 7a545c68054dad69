"""streaming/stream.py:interval_join_streams — native stream-stream
interval join: equivalence with the batch inequality join, window bounds,
split-invariance of inner-join emissions under a wide watermark."""

from __future__ import annotations

import datetime as dt
import os

from europarl_crawler_spark.streaming.stream import drain_interval_join

T = dt.datetime


def _write(spark, tmp_path, name, rows, n_files=2):
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    ).repartition(n_files).write.parquet(d)
    return d


def test_matches_batch_inequality_join(spark, tmp_path):
    probes = [
        (1, 10, T(2024, 1, 1, 0, 0, 0)),
        (2, 10, T(2024, 1, 1, 1, 0, 0)),
        (3, 20, T(2024, 1, 1, 0, 0, 0)),
    ]
    confirms = [
        (100, 10, T(2024, 1, 1, 0, 5, 0)),   # in window of probe 1
        (101, 10, T(2024, 1, 1, 0, 10, 0)),  # exactly at the bound: inclusive
        (102, 10, T(2024, 1, 1, 0, 10, 1)),  # one past: out
        (103, 20, T(2023, 12, 31, 23, 59)),  # before the probe: out
        (104, 30, T(2024, 1, 1, 0, 1, 0)),   # wrong key: out
    ]
    pd_, cd = (
        _write(spark, tmp_path, "p", probes),
        _write(spark, tmp_path, "c", confirms),
    )
    got = sorted(
        (r.user_id, r.probe_id, r.confirm_id, r.lag_s)
        for r in drain_interval_join(
            spark, pd_, cd, str(tmp_path / "ck"), "ivj_t1",
            window_s=600, watermark="365 days",
        ).collect()
    )
    assert got == [(10, 1, 100, 300), (10, 1, 101, 600)]


def test_multiple_confirms_per_probe_and_overlap(spark, tmp_path):
    probes = [(1, 5, T(2024, 1, 1, 0, 0)), (2, 5, T(2024, 1, 1, 0, 4))]
    confirms = [(9, 5, T(2024, 1, 1, 0, 5))]  # inside BOTH probe windows
    pd_, cd = (
        _write(spark, tmp_path, "p", probes, n_files=1),
        _write(spark, tmp_path, "c", confirms, n_files=1),
    )
    got = sorted(
        (r.probe_id, r.confirm_id)
        for r in drain_interval_join(
            spark, pd_, cd, str(tmp_path / "ck"), "ivj_t2",
            window_s=600, watermark="365 days",
        ).collect()
    )
    assert got == [(1, 9), (2, 9)]
