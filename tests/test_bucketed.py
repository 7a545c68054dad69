"""Bucketed co-located joins (sources/bucketed.py): the exchange-free
property asserted on the physical plan, value parity with the plain
shuffle join, and the same-bucket-count requirement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.sources import bucketed


@pytest.fixture(scope="module")
def tables(spark):
    orders = spark.createDataFrame(
        [(i, i % 17, float(10 + i % 50) + 0.25) for i in range(600)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, ["AUTO", "BUILD", "HOUSE"][i % 3]) for i in range(17)],
        "c_custkey long, c_mktsegment string",
    )
    return orders, customer


def test_bucketed_join_has_no_exchange(spark, tables):
    orders, customer = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = bucketed.bucketed_join_plan(spark, orders, customer, n_buckets=4)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # the unbucketed control DOES shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ctrl = (
            orders.withColumnRenamed("o_custkey", "custkey")
            .join(customer.withColumnRenamed("c_custkey", "custkey"), "custkey")
        )
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in ctrl_plan


def test_values_equal_plain_join(spark, tables):
    orders, customer = tables
    got = sorted(
        tuple(r)
        for r in bucketed.bucketed_revenue_by_segment(
            spark, orders, customer, n_buckets=4
        ).collect()
    )
    plain = sorted(
        tuple(r)
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")
            ).alias("revenue_cents"),
        )
        .collect()
    )
    assert got == plain
