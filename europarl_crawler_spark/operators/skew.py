"""Join-side skew mitigation: the salted replicate join.

The frontier already defuses AGGREGATION skew with per-(host, salt)
two-level pruning (plans/frontier.py:291-314). This is the JOIN-side
twin, for the shape a crawl hits constantly: a fact table where one key
dwarfs the rest (one hot host owns 30% of 10^10 frontier rows) joined to
a per-key dimension that is too big — or too churn-prone — to broadcast.

A plain shuffle join puts every row of the hot key in ONE task: the job
runs at the speed of its slowest straggler and can OOM it. The salted
rewrite splits each big-side key into ``n_salts`` sub-keys via a
DETERMINISTIC row hash (xxhash64 over the row — distribution-only, no
effect on results, reproducible across retries — never rand(), which
breaks task-retry idempotency), and replicates each small-side row once
per salt, so the hot key's rows spread over ``n_salts`` tasks:

    big:   (k, …)  → (k, h(row) % S, …)
    small: (k, …)  → (k, 0 …), (k, 1, …), …, (k, S-1, …)
    JOIN ON (k, salt)

Cost: |small| × S replicated rows — chosen INSTEAD of broadcast when
|small| is too big to ship to every executor yet skew makes the plain
shuffle unusable; S needs only to cover the straggler ratio (8–32), not
the executor count. AQE's skew-join split (also enabled in this repo's
sessions) handles the same problem adaptively for SORT-MERGE joins; the
explicit salt is the deterministic, planner-independent lever — and the
only one available when the join must be a shuffled HASH join or when
one key exceeds what one task can even hold.

Semantics: identical to ``big.join(small, key, how)`` for 'inner' and
'left' (each big row carries exactly one salt; each small (key, salt)
exists exactly once). 'right'/'full' are refused — an unmatched small
row would surface S times, once per salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = ("inner", "left", "leftouter", "left_outer")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` on ``key`` with the big side salted ``n_salts``
    ways and the small side replicated to match. Columns: big's then
    small's minus the join key, like a plain ``join(..., on=key)``."""
    if how not in _ALLOWED:
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: an "
            "unmatched small-side row would be emitted once per salt"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(int(n_salts))),
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
    ).hint("shuffle_hash")
    return b.join(s, on=[key, "_salt"], how=how).drop("_salt")
