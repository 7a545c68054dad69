"""Link-graph analytics: integer-exact PageRank for frontier prioritization.

A web-scale crawler ranks hosts/pages to order its frontier (the classic
use of PageRank since Page et al. 1999 — crawl-priority, not just serving).
This module implements power-iteration PageRank as pure DataFrame algebra
with EXACT integer arithmetic, so the fixed-point after K iterations is
bit-identical in any engine (floats would drift across summation orders):

- ranks are int64 scaled by 2^40; r0 = SCALE // n_nodes;
- each iteration: contribution(u→v) = r(u) // outdeg(u) (exact integer
  division), r'(v) = teleport + (85 · Σ contributions) // 100 with
  teleport = (15 · (SCALE // n_nodes)) // 100 — the damping rationals are
  applied as integer mul-then-div, never as a float 0.85;
- sums of int64 contributions are shuffle-order independent, so the whole
  K-step computation value-checks in SQL (``pagerank_sql`` emits the same
  arithmetic as K chained CTEs).

Scale shape (10^10-edge graphs): out-degrees are computed once; each
iteration is ONE shuffle — join ranks⋈edges on src (both sides hash-
partitioned by the same key, so Catalyst reuses the exchange across
iterations) followed by a map-side-combinable groupBy(dst); the node set
never collects. K is fixed (default 10): production runs pick K from the
convergence budget, not from a driver-side convergence loop over
``collect()``ed residuals — at 2^40 scaling, 10 iterations moves ranks
well past float32 print precision on web-shaped graphs. Dangling mass:
nodes with no out-edges contribute nothing (their mass exits, the
teleport term keeps totals bounded) — the standard simplification; the
redistribute variant is one extra broadcast agg per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 40
D_NUM, D_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, dst) distinct edge list → (node, rank) after ``n_iter`` exact
    integer power iterations. ``n_nodes`` is the node-universe size used
    for the uniform start and teleport term (thread it from metadata — no
    hidden count). Nodes appear in the output iff they occur in the edge
    list (isolated nodes hold the constant teleport+0 rank)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = SCALE // n_nodes
    teleport = (15 * base) // 100
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    for it in range(n_iter):
        # cut lineage every 4 rounds — an iterative DataFrame loop otherwise
        # grows the logical plan (and analysis time) exponentially; same
        # discipline as near_dup_groups' pointer-jumping loop (dedup.py; on
        # a cluster with a checkpoint dir, swap in reliable checkpoint())
        if it and it % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(out_deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))  # exact long div
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"(coalesce(s, 0) * {D_NUM}) div {D_DEN}")
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    edges_sql: str, n_nodes_sql: str, n_iter: int = 10
) -> str:
    """DuckDB mirror of :func:`pagerank`: the same integer arithmetic as
    ``n_iter`` chained (non-recursive) CTEs — unrolled because standard
    SQL recursion cannot re-aggregate the full rank vector per step.
    ``edges_sql``: a subquery yielding (src, dst); ``n_nodes_sql``: a
    scalar subquery for the node-universe size."""
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) raw)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"c AS (SELECT ({SCALE}::BIGINT // ({n_nodes_sql})) AS base, "
        f"(15 * ({SCALE}::BIGINT // ({n_nodes_sql}))) // 100 AS tp)",
        "r0 AS (SELECT node, (SELECT base FROM c) AS rank FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"s{i} AS (SELECT e.dst, sum(r{i}.rank // deg.deg) AS s "
            f"FROM r{i} JOIN e ON r{i}.node = e.src "
            f"JOIN deg ON e.src = deg.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"(SELECT tp FROM c) + (coalesce(s{i}.s, 0) * {D_NUM}) // {D_DEN} "
            f"AS rank FROM nodes n LEFT JOIN s{i} ON n.node = s{i}.dst)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{n_iter}"
    )
