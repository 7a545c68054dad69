"""operators/asof.py — as-of join contract tests.

Reference parity: the crawl judges every request against the per-host
control state in effect AT REQUEST TIME (robots snapshot, post-429
backoff — europarl/downloader/worker.py's state lookups); the as-of join
is that lookup as one distributed operator. These tests pin the tie,
NULL-value, tolerance, and tiebreak semantics the DuckDB ASOF-JOIN oracle
lane (j13_asof_throttle) relies on."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from europarl_crawler_spark.operators.asof import asof_join

T = dt.datetime


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_basic_latest_preceding_and_left_semantics(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 20)), (2, T(2024, 1, 1, 0, 0, 5))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 0, 10), 5.0),
            (1, T(2024, 1, 1, 0, 0, 15), 7.0),  # latest ≤ 20 wins
            (1, T(2024, 1, 1, 0, 0, 30), 9.0),  # future — never visible
        ],
        "k long, ts timestamp, v double",
    )
    out = _rows(asof_join(left, right, key="k", value_cols=["v"]))
    assert out == [
        (1, T(2024, 1, 1, 0, 0, 20), T(2024, 1, 1, 0, 0, 15), 7.0),
        (2, T(2024, 1, 1, 0, 0, 5), None, None),  # no match → LEFT row kept
    ]


def test_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 1))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 3.0)], "k long, ts timestamp, v double"
    )
    out = _rows(asof_join(left, right, key="k", value_cols=["v"]))
    assert out == [(1, T(2024, 1, 1), T(2024, 1, 1), 3.0)]


def test_null_value_column_does_not_skip_to_older_row(spark):
    # the matched row travels as a packed struct: a NULL value on the
    # LATEST right row must yield (its ts, NULL) — not an older row's value
    left = spark.createDataFrame([(1, T(2024, 1, 2))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 5.0), (1, T(2024, 1, 1, 12), None)],
        "k long, ts timestamp, v double",
    )
    out = _rows(asof_join(left, right, key="k", value_cols=["v"]))
    assert out == [(1, T(2024, 1, 2), T(2024, 1, 1, 12), None)]


def test_tolerance_boundary_inclusive_then_null(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 1, 0)), (2, T(2024, 1, 1, 0, 1, 1))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 5.0), (2, T(2024, 1, 1), 5.0)],
        "k long, ts timestamp, v double",
    )
    out = _rows(asof_join(left, right, key="k", value_cols=["v"], tolerance_s=60))
    # k=1 is exactly 60 s old → kept; k=2 is 61 s → stale, nulled but kept
    assert out == [
        (1, T(2024, 1, 1, 0, 1, 0), T(2024, 1, 1), 5.0),
        (2, T(2024, 1, 1, 0, 1, 1), None, None),
    ]


def test_right_order_tiebreak_last_wins(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 2))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 10, 1.0), (1, T(2024, 1, 1), 20, 2.0)],
        "k long, ts timestamp, seq long, v double",
    )
    out = _rows(
        asof_join(left, right, key="k", value_cols=["v"], right_order="seq")
    )
    assert out == [(1, T(2024, 1, 2), T(2024, 1, 1), 2.0)]


def test_no_global_window_in_plan(spark):
    # scale contract: the running window is PARTITIONED by the key — an
    # empty partitionBy would serialize the whole input through one task
    left = spark.createDataFrame([(1, T(2024, 1, 1))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 1.0)], "k long, ts timestamp, v double"
    )
    plan = (
        asof_join(left, right, key="k", value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_k#" in line.split("windowspecdefinition")[0] or "_k#" in line


def test_multiple_value_columns_and_prefix(spark):
    left = spark.createDataFrame([(7, T(2024, 1, 5))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, T(2024, 1, 4), 2.5, "slow")],
        "k long, ts timestamp, rate double, mode string",
    )
    out = asof_join(
        left, right, key="k", value_cols=["rate", "mode"], prefix="st_"
    )
    assert out.columns == ["k", "ts", "st_ts", "st_rate", "st_mode"]
    assert _rows(out) == [(7, T(2024, 1, 5), T(2024, 1, 4), 2.5, "slow")]
