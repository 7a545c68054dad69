"""operators/skew.py — salted replicate join: result-equivalence with the
plain join, salt actually spreading the hot key, and the plan contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.operators.skew import salted_join


def _fixture(spark):
    # hot key 7 carries 400 of 430 rows — the straggler shape
    big = spark.createDataFrame(
        [(7, i) for i in range(400)] + [(k, 0) for k in range(30)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(30)] + [(7, "hot")], "k long, tag string"
    )
    return big, small


def test_inner_matches_plain_join(spark):
    big, small = _fixture(spark)
    got = sorted(tuple(r) for r in salted_join(big, small, "k", 8).collect())
    want = sorted(tuple(r) for r in big.join(small, "k", "inner").collect())
    assert got == want


def test_left_keeps_unmatched_big_rows_once(spark):
    big = spark.createDataFrame([(1, 10), (99, 20)], "k long, payload long")
    small = spark.createDataFrame([(1, "a")], "k long, tag string")
    got = sorted(tuple(r) for r in salted_join(big, small, "k", 4, how="left").collect())
    assert got == [(1, 10, "a"), (99, 20, None)]


def test_hot_key_spreads_over_salts(spark):
    big, _ = _fixture(spark)
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n = salted.where(F.col("k") == 7).select("_salt").distinct().count()
    assert n >= 6  # 400 hashed rows across 8 salts — skew actually split


def test_join_keys_include_salt_in_plan(spark):
    big, small = _fixture(spark)
    plan = (
        salted_join(big, small, "k", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan and "Broadcast" not in plan.split("\n")[0]


def test_right_and_full_refused(spark):
    big, small = _fixture(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", 8, how=how)
