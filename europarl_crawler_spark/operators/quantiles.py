"""Distributed exact quantiles via cumulative bucket counts — the
scale-correct way to answer "P50/P90/P99 latency per event type" over an
unbounded stream of rows: quantize the measure to a bounded-cardinality
integer grid, count per (group, bucket) (map-side combinable), and walk
the cumulative distribution — the corpus is never sorted, only the
per-group bucket table is (bounded by the grid, not the row count).

Spark's builtin ``percentile_approx`` (GK sketch) and DuckDB's ``quantile``
use different algorithms and never agree bit-for-bit; this lane's
quantiles are EXACT on the quantized grid in both engines:

    vq          = floor(value * 100)       (integer cents; one double
                                            multiply, identical IEEE in
                                            both engines)
    rank(q)     = ceil(q * n) as the pure-integer (n*num + den - 1) // den
    P_q         = min vq whose cumulative count reaches rank(q)

which is the classic type-1 (inverse-CDF) quantile definition.

Plan shape at 100 TB: one groupBy (group, bucket) count, one per-group
window over the BUCKET table (cardinality = value grid, thousands — not
rows), one per-group conditional-min agg.  No global sort, no sketch
approximation error to reason about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# quantiles as exact integer fractions (numerator, denominator)
QS = (("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100))


def bucket_counts(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(g, vq, c): the per-(group, bucket) count table — the whole state of
    the quantile computation, mergeable across shards/epochs/micro-batches
    by ADDING counts (which is why the streaming twin is a plain streaming
    groupBy count; see streaming/sketchstream.py's drain helpers)."""
    vq = F.floor(F.col(value_col) * F.lit(100.0)).cast("long")
    return (
        df.select(F.col(group_col).alias("g"), vq.alias("vq"))
        .groupBy("g", "vq")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantiles_from_counts(counts: DataFrame, group_col: str = "event_type") -> DataFrame:
    """The cumulative walk over a (g, vq, c) table — shared verbatim by the
    batch and streaming lanes."""
    w = (
        Window.partitionBy("g")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w))
    n = counts.groupBy("g").agg(F.sum("c").alias("n"))
    j = cum.join(n, "g")
    aggs = [F.max("n").alias("n")]
    for name, num, den in QS:
        rank = (F.col("n") * num + (den - 1)) / den
        rank = F.floor(rank).cast("long")  # == ceil(q*n) for integer n*num
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("vq"))).alias(name)
        )
    return (
        j.groupBy("g")
        .agg(*aggs)
        .select(F.col("g").alias(group_col), "n", *[q[0] for q in QS])
    )


def quantiles_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(group, n, p50, p90, p99) with quantiles on the integer-cent grid."""
    return quantiles_from_counts(
        bucket_counts(df, group_col, value_col), group_col
    )


def quantiles_by_group_sql(
    table: str = "events",
    group_expr: str = "event_type",
    value_expr: str = "value",
) -> str:
    """DuckDB mirror — same grid, same integer rank, same cumulative walk."""
    qcols = ", ".join(
        f"MIN(CASE WHEN cum >= (n * {num} + {den - 1}) // {den} "
        f"THEN vq END) AS {name}"
        for name, num, den in QS
    )
    return f"""
WITH b AS (SELECT {group_expr} AS g,
                  CAST(floor({value_expr} * 100.0) AS BIGINT) AS vq
           FROM {table}),
counts AS (SELECT g, vq, count(*) AS c FROM b GROUP BY 1, 2),
cum AS (SELECT g, vq, c,
               sum(c) OVER (PARTITION BY g ORDER BY vq
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts),
n AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY g)
SELECT cum.g AS {group_expr}, CAST(MAX(n.n) AS BIGINT) AS n, {qcols}
FROM cum JOIN n ON n.g = cum.g
GROUP BY cum.g
"""
