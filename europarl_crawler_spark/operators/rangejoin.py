"""Range (interval-containment) join via fixed-width bin blocking.

The crawl shape this exists for: map a host address into the CIDR/ASN
range that owns it (per-ASN politeness is how polite crawlers cap
aggregate load on one operator's infrastructure — the reference's
per-host TokenBucket generalized one level up), or land a request
timestamp inside a maintenance/throttle window. Both are
``point ∈ [start, end)`` joins.

Expressed naively (``points JOIN intervals ON start <= p AND p < end``)
Spark has no equi-key, so Catalyst's ONLY physical choice is
BroadcastNestedLoopJoin / CartesianProduct — O(|points| × |intervals|)
comparisons, a cluster-killer the moment the interval side outgrows a
broadcast (10^6 CIDR blocks × 10^10 requests).

The blocking rewrite makes it an EQUI join:

    bin(x)   = floor(x / w)                    (w = a fixed bin width)
    interval → one row per bin it overlaps     (explode(sequence(...)))
    point    → its single bin
    JOIN ON bin (+ any equi keys) THEN the exact start<=p<end filter

Cost: |intervals| × (1 + len/w) candidate rows and |points| probes,
hash-joined on the bin key — shuffled when big, broadcast when small,
never nested-loop. ``w`` trades replication against selectivity: pick w
near the MEDIAN interval length so typical intervals land in O(1) bins
while each point meets only the intervals plausibly containing it.
Containment is exact regardless of w — the filter re-checks — so a bad
w costs speed, never rows. A point matches each interval at most once
(its bin is unique), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair with
    ``start <= point < end`` (and equality on ``keys``, e.g. a host
    column for per-host windows). Columns: all of ``points``' then all
    of ``intervals``' (names must not collide apart from ``keys``).

    Intervals must be half-open with ``end > start``; empty/negative
    intervals are dropped (they contain no point — and Spark's
    ``sequence(a, b)`` RUNS BACKWARDS when b < a, which would otherwise
    fabricate bins below the interval)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    keys = list(keys or [])
    w = F.lit(int(bin_width))
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.floor((F.col(end_col) - F.lit(1)) / w),
            )
        ),
    )
    pt = points.withColumn("_bin", F.floor(F.col(point_col) / w))
    cond = [pt["_bin"] == iv["_bin"]] + [pt[k] == iv[k] for k in keys]
    joined = pt.join(iv, cond, "inner").where(
        (iv[start_col] <= pt[point_col]) & (pt[point_col] < iv[end_col])
    )
    out_cols = [pt[c] for c in points.columns]
    out_cols += [iv[c] for c in intervals.columns if c not in keys]
    return joined.select(*out_cols)


# ---------------------------------------------------------------------------
# the IP → ASN dimension both the lane and its oracle derive from constants
# ---------------------------------------------------------------------------

#: 2^32 address space, 256 scrambled boundaries → 257 contiguous ranges.
#: Knuth's 2654435761 multiplicative scramble — spec constant, same integer
#: algebra on both engines.
ADDR_SPACE = 1 << 32
N_BOUNDARIES = 256
_MULT = 2654435761
_OFF = 12345


def asn_ranges_py() -> list[tuple[int, int, int]]:
    """(asn, range_start, range_end) — contiguous, covering [0, 2^32)."""
    bs = sorted((i * _MULT + _OFF) % ADDR_SPACE for i in range(N_BOUNDARIES))
    edges = [0] + bs + [ADDR_SPACE]
    return [
        (asn, lo, hi)
        for asn, (lo, hi) in enumerate(zip(edges[:-1], edges[1:]))
        if hi > lo
    ]


def asn_ranges_sql() -> str:
    """DuckDB mirror of :func:`asn_ranges_py` from ``generate_series``."""
    return f"""
SELECT row_number() OVER (ORDER BY lo) - 1 AS asn, lo, hi
FROM (
  SELECT lo, lead(lo, 1, {ADDR_SPACE}) OVER (ORDER BY lo) AS hi
  FROM (
    SELECT 0 AS lo
    UNION ALL
    SELECT (i * {_MULT} + {_OFF}) % {ADDR_SPACE} AS lo
    FROM (SELECT unnest(generate_series(0, {N_BOUNDARIES - 1})) AS i)
  )
) WHERE hi > lo
"""


def ip_of_key_sql(key_expr: str) -> str:
    """The synthetic host address for an integer key (both engines)."""
    return f"(({key_expr} * {_MULT} + {_OFF * 7}) % {ADDR_SPACE})"


def ip_of_key(key) -> Column:
    return F.pmod(F.col(key) * F.lit(_MULT) + F.lit(_OFF * 7), F.lit(ADDR_SPACE))
