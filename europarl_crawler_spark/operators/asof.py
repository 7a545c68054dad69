"""As-of (time-travel lookup) join — attach to each left row the LATEST
right row with the same key whose timestamp does not exceed the left row's.

The crawl semantics this exists for (reference parity): per-host control
state evolves over time — robots.txt re-fetches, throttle updates after a
429 (europarl/downloader/worker.py's backoff path), recrawl-rule edits —
and every request must be judged against the state *in effect at request
time*, not the current one. SQL expresses that as a correlated
greatest-ts-≤ subquery; DuckDB/Pandas call it ASOF JOIN / merge_asof.
Spark has no built-in, so this is the classic composition:

    UNION the two sides (right rows carry a packed struct, left rows a
    NULL) → ONE shuffle keyed by the join key → per-key time sort →
    ``last(struct, ignorenulls=True)`` over an unbounded-preceding running
    window → keep the left rows.

Why this shape at 100 TB and not a join:

- An equi-join on key with an inequality filter + per-left-row argmax
  explodes to |left|×|right-per-key| intermediate rows before the argmax
  prunes them. The union form never materialises a candidate pair: the
  running window carries O(1) state per row, so the cost is exactly one
  shuffle + one sort of |left|+|right| rows — the same price as the
  sort-merge join Spark would pick anyway, without the blowup.
- The window is PARTITIONED by the key — no global window, executors
  stream their keys independently.
- Skew lever (documented, not default): a pathological host with 10^8
  requests lands on one task. The fix is the two-pass boundary-carry
  split: range-split that key's rows by time, compute each split's
  running ``last`` locally, then prefix-carry the per-split tail states
  (a per-split-count-sized table) — same trick the exact-quantile lane
  uses for its cumulative walk. Not wired by default because the carry
  pass costs a second shuffle every caller pays, skewed or not.

Tie rules (pinned by tests and by the DuckDB ``ASOF JOIN`` oracle lane):
right rows at *exactly* the left timestamp DO match (inclusive ≤);
among right rows sharing one (key, ts), the one sorting LAST by the
``right_order`` tiebreak wins — pass a unique right-side column there
whenever (key, ts) is not unique, or the winner is plan-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    right_order: str | None = None,
    tolerance_s: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix+right_ts`` /
    ``prefix+v`` for each v in ``value_cols`` from the matched right row
    (all NULL when no right row precedes the left row — LEFT semantics).

    ``tolerance_s``: matches older than this many whole seconds are
    discarded (the matched columns go NULL), mirroring pandas
    ``merge_asof(tolerance=...)`` — a crawl uses it to refuse stale robots
    snapshots rather than silently trusting a year-old one.
    """
    value_cols = list(value_cols or [])
    # the matched right row travels as ONE packed struct so a legitimately
    # NULL value column can never make last(ignorenulls) skip past its row
    # to an older one — the struct itself is non-null per right row
    packed = F.struct(
        F.col(right_ts).cast("timestamp").alias("_mts"),
        *[F.col(v).alias(v) for v in value_cols],
    )
    order_cols = [F.col("_ts"), F.col("_side")]
    if right_order is not None:
        # right tiebreak sorts NULL-last on the left side automatically:
        # left rows carry NULL here and _side already orders them after
        order_cols.append(F.col("_tie"))
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(right_order) if right_order is not None else F.lit(None)).alias("_tie"),
        packed.alias("_m"),
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_m"].dataType).alias("_m"),
        F.struct(*left.columns).alias("_l"),
    )
    u = r.select(*l.columns[:5], F.lit(None).cast(l.schema["_l"].dataType).alias("_l")).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_match", F.last("_m", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    m: Column = F.col("_match")
    if tolerance_s is not None:
        fresh = (
            F.unix_timestamp(F.col("_ts")) - F.unix_timestamp(m["_mts"])
        ) <= F.lit(int(tolerance_s))
        m = F.when(fresh, m)
    out = [F.col("_l")[c].alias(c) for c in left.columns]
    out.append(m["_mts"].alias(prefix + right_ts))
    out.extend(m[v].alias(prefix + v) for v in value_cols)
    return carried.select(*out)


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    left_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    prefix: str = "asof_",
) -> str:
    """The DuckDB mirror — its native ``ASOF LEFT JOIN`` (greatest right ts
    ≤ left ts per key, inclusive ties: the exact contract above). Callers
    must make (key, right_ts) unique on the right side, as the operator's
    tie docs require; tolerance is applied as a post-join NULL-out so LEFT
    rows survive exactly like the Spark path."""
    value_cols = list(value_cols or [])
    left_cols = list(left_cols or [key, left_ts])
    guard = "TRUE"
    if tolerance_s is not None:
        guard = (
            f"(floor(epoch(l.{left_ts})) - floor(epoch(r.{right_ts})))"
            f" <= {int(tolerance_s)}"
        )
    sel = [f"l.{c} AS {c}" for c in left_cols]
    sel.append(f"CASE WHEN {guard} THEN r.{right_ts} END AS {prefix}{right_ts}")
    sel.extend(f"CASE WHEN {guard} THEN r.{v} END AS {prefix}{v}" for v in value_cols)
    return (
        f"SELECT {', '.join(sel)} FROM ({left_sql}) l "
        f"ASOF LEFT JOIN ({right_sql}) r "
        f"ON l.{key} = r.{key} AND l.{left_ts} >= r.{right_ts}"
    )
