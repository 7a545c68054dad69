"""operators/rangejoin.py — binned interval-containment join.

Pins: half-open [start, end) bounds, bin-boundary straddling, empty
intervals dropped, per-host equi keys, and the PLAN contract (equi hash
join, never BroadcastNestedLoopJoin/CartesianProduct — the whole point of
the blocking rewrite)."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.operators.rangejoin import (
    ADDR_SPACE,
    asn_ranges_py,
    interval_join_binned,
)


def _pts(spark, xs):
    return spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "pid long, p long")


def _ivs(spark, ivs):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(ivs)], "iid long, lo long, hi long"
    )


def _pairs(out):
    return sorted((r.pid, r.iid) for r in out.collect())


def test_half_open_and_boundary_straddle(spark):
    # interval [8, 24) straddles bins of width 10; points probe both ends
    out = interval_join_binned(
        _pts(spark, [7, 8, 15, 23, 24]),
        _ivs(spark, [(8, 24)]),
        point_col="p", start_col="lo", end_col="hi", bin_width=10,
    )
    assert _pairs(out) == [(1, 0), (2, 0), (3, 0)]  # 8 in, 24 out, 7 out


def test_empty_and_inverted_intervals_match_nothing(spark):
    out = interval_join_binned(
        _pts(spark, [5]),
        _ivs(spark, [(5, 5), (9, 3)]),
        point_col="p", start_col="lo", end_col="hi", bin_width=4,
    )
    assert _pairs(out) == []


def test_overlapping_intervals_each_match_once(spark):
    out = interval_join_binned(
        _pts(spark, [10]),
        _ivs(spark, [(0, 100), (5, 11), (10, 11), (11, 50)]),
        point_col="p", start_col="lo", end_col="hi", bin_width=3,
    )
    assert _pairs(out) == [(0, 0), (0, 1), (0, 2)]


def test_equi_keys_scope_the_join(spark):
    pts = spark.createDataFrame(
        [(0, "a.example", 5), (1, "b.example", 5)], "pid long, host string, p long"
    )
    ivs = spark.createDataFrame(
        [(0, "a.example", 0, 10)], "iid long, host string, lo long, hi long"
    )
    out = interval_join_binned(
        pts, ivs, point_col="p", start_col="lo", end_col="hi",
        bin_width=8, keys=["host"],
    )
    assert _pairs(out) == [(0, 0)]
    assert out.columns == ["pid", "host", "p", "iid", "lo", "hi"]


def test_plan_is_equi_hash_join_not_nested_loop(spark):
    pts = _pts(spark, list(range(50)))
    ivs = _ivs(spark, [(i * 7, i * 7 + 12) for i in range(20)])
    out = interval_join_binned(
        pts, ivs, point_col="p", start_col="lo", end_col="hi", bin_width=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_bad_bin_width_raises(spark):
    with pytest.raises(ValueError):
        interval_join_binned(
            _pts(spark, [1]), _ivs(spark, [(0, 2)]),
            point_col="p", start_col="lo", end_col="hi", bin_width=0,
        )


def test_asn_ranges_contiguous_cover():
    rs = asn_ranges_py()
    assert rs[0][1] == 0 and rs[-1][2] == ADDR_SPACE
    for (_, _, hi), (_, lo2, _) in zip(rs[:-1], rs[1:]):
        assert hi == lo2  # contiguous ⇒ every address matches exactly once
