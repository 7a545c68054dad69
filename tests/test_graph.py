"""Integer-exact PageRank: numpy replay, structure sanity, invariance."""

from __future__ import annotations

import numpy as np

from europarl_crawler_spark.operators.graph import SCALE, pagerank


def _replay(edges, n_nodes, n_iter):
    """Pure-python replay of the exact integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    e = sorted(set(edges))
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    base = SCALE // n_nodes
    tp = (15 * base) // 100
    r = {v: base for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += r[u] // deg[u]
        r = {v: tp + (s[v] * 85) // 100 for v in nodes}
    return r


def test_pagerank_matches_integer_replay(spark):
    rng = np.random.RandomState(5)
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, 30, (200, 2)) if a != b})
    df = spark.createDataFrame(edges, "src long, dst long").repartition(4)
    got = {r["node"]: r["rank"] for r in pagerank(df, n_nodes=30, n_iter=6).collect()}
    assert got == _replay(edges, 30, 6)


def test_hub_outranks_leaf(spark):
    # star: everyone links to node 0; node 0 links to node 1. At the fixed
    # point r(0) ≈ 8.65·tp > r(1) ≈ 8.35·tp > r(leaf) = tp — run enough
    # iterations to pass the transient (0.85^40 ≈ 1e-3 of the start mass)
    edges = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_nodes=10, n_iter=40).collect()}
    assert got[0] > got[1] > got[2]
    assert len({got[i] for i in range(2, 10)}) == 1  # symmetric leaves tie


def test_dangling_node_keeps_teleport_floor(spark):
    # 1 -> 2; 2 dangles (no out-edges): its rank still gets inbound mass,
    # node 1 (no inbound) decays to the teleport floor
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_nodes=2, n_iter=5).collect()}
    tp = (15 * (SCALE // 2)) // 100
    assert got[1] == tp
    assert got[2] > got[1]


def test_duplicate_edges_collapse(spark):
    df1 = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    df2 = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r1 = sorted(map(tuple, pagerank(df1, 2, 4).collect()))
    r2 = sorted(map(tuple, pagerank(df2, 2, 4).collect()))
    assert r1 == r2
