"""Bucketed-table co-located joins — the pre-partitioning lever the scale
notes keep citing (README "Scale design", similarity.py's bucketBy
production note), made runnable and plan-asserted instead of staying a
comment.

`df.write.bucketBy(n, key)` hash-partitions rows into a fixed number of
per-key buckets AT WRITE TIME and records the layout in the catalog; a
join of two tables bucketed by the join key with the same bucket count
then runs as a sort-merge join with ZERO Exchange — the shuffle was paid
once when the data was written, and every subsequent join/aggregation on
that key rides it for free.  That is exactly how a 100 TB deployment
co-locates its big fact-fact joins (frontier ⋈ requests ⋈ documents on
url_hash): the epoch tables are written bucketed by url_hash, and the
per-epoch merge never shuffles the store again.

tests/test_bucketed.py asserts the property mechanically: the bucketed
plan contains a SortMergeJoin and NO Exchange (with broadcast disabled so
nothing hides the shuffle), while the same join over plain parquet shows
Exchanges; values are identical.

Reference analog: Postgres gets this from btree indexes + local joins on
one box (europarl/db/*.py); bucketing is the distributed equivalent.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int
) -> None:
    """Materialize ``df`` as a catalog table bucketed (and sorted) by
    ``key`` — the one-time shuffle that later joins on ``key`` skip."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_revenue_by_segment(
    spark: SparkSession, orders: DataFrame, customer: DataFrame, n_buckets: int = 8
) -> DataFrame:
    """orders ⋈ customer on custkey over SAME-bucket-count tables, rolled
    up to market segment.  Both writes bucket by the join key, so the join
    itself is exchange-free (asserted in tests); the lane's downstream
    aggregate is segment-sized."""
    run = uuid.uuid4().hex[:8]
    to, tc = f"b_orders_{run}", f"b_customer_{run}"
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), to, "custkey", n_buckets
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), tc, "custkey", n_buckets
    )
    j = spark.table(to).join(spark.table(tc), "custkey")
    out = (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact integer money: totalprice is dollars.cents — quantize
            # per row before the sum so the aggregate is order-independent
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")
            ).alias("revenue_cents"),
        )
        .select("c_mktsegment", "n_orders", "revenue_cents")
    )
    return out


def bucketed_join_plan(
    spark: SparkSession, orders: DataFrame, customer: DataFrame, n_buckets: int = 8
) -> str:
    """The physical plan string of the bucketed join (test surface)."""
    run = uuid.uuid4().hex[:8]
    to, tc = f"p_orders_{run}", f"p_customer_{run}"
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), to, "custkey", n_buckets
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), tc, "custkey", n_buckets
    )
    j = spark.table(to).join(spark.table(tc), "custkey")
    return j._jdf.queryExecution().executedPlan().toString()


def revenue_by_segment_sql(table_o: str = "orders", table_c: str = "customer") -> str:
    """DuckDB mirror — bucketing changes the physical plan only; the
    logical result is a plain join+rollup."""
    return f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM {table_o} o JOIN {table_c} c ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""
