"""Integer-exact k-means (operators/cluster.py): Lloyd behavior against a
pure-Python reference on the same quantized integers, objective
monotonicity, empty-cell carry-forward, partitioning invariance, and
cross-engine parity with the generated DuckDB mirror."""

from __future__ import annotations

import math

import duckdb
import pytest

from europarl_crawler_spark.functions import porthash
from europarl_crawler_spark.operators import cluster

DIMS = 8


def _vecs(n):
    # three well-separated blobs + deterministic jitter
    out = []
    for i in range(n):
        c = i % 3
        base = [0.0] * DIMS
        base[c] = 1.0
        jit = [((i * 31 + d * 7) % 13 - 6) / 100.0 for d in range(DIMS)]
        out.append((i, [base[d] + jit[d] for d in range(DIMS)]))
    return out


def _ref_kmeans(rows, k, rounds):
    q = {i: [math.floor(float(x) * cluster.QUANT) for x in v] for i, v in rows}
    n = len(rows)
    stride = max(n // (k * 2), 1)
    a0, b0 = porthash.AFFINE_A[0], porthash.AFFINE_B[0]
    seeds = sorted(
        i for i in q if ((a0 * (i % porthash.P) + b0) % porthash.P) % stride == 0
    )[:k]
    cents = {i: list(q[i]) for i in seeds}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((x - c) ** 2 for x, c in zip(v, cv)), cell)
                for cell, cv in cents.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(rounds):
        asg = assign()
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for i, (cell, _) in asg.items():
            s = sums.setdefault(cell, [0] * DIMS)
            for d in range(DIMS):
                s[d] += q[i][d]
            cnts[cell] = cnts.get(cell, 0) + 1
        for cell in cents:
            if cell in cnts:
                cents[cell] = [
                    math.floor(sums[cell][d] / cnts[cell]) for d in range(DIMS)
                ]
    return assign()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vecs(300), "vec_id long, embedding array<float>"
    )


def test_matches_reference(spark, emb):
    got = {
        r.vec_id: (r.cell_id, r.dist_q)
        for r in cluster.kmeans_assign(emb, k=3, rounds=2, n=300).collect()
    }
    # reference quantizes the float32 values Spark sees
    rows = [
        (r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()
    ]
    assert got == _ref_kmeans(rows, 3, 2)


def test_objective_decreases_with_rounds(spark, emb):
    def sse(rounds):
        return sum(
            r.dist_q
            for r in cluster.kmeans_assign(emb, k=3, rounds=rounds, n=300).collect()
        )

    s1, s3 = sse(1), sse(3)
    assert s3 <= s1


def test_partitioning_invariance(spark, emb):
    a = cluster.kmeans_assign(emb, k=3, rounds=2, n=300).collect()
    b = cluster.kmeans_assign(
        emb.repartition(7, "vec_id"), k=3, rounds=2, n=300
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_blobs_separate(spark, emb):
    got = cluster.kmeans_assign(emb, k=3, rounds=3, n=300).collect()
    by_true: dict[int, set] = {0: set(), 1: set(), 2: set()}
    for r in got:
        by_true[r.vec_id % 3].add(r.cell_id)
    # each true blob lands in exactly one learned cell, all distinct
    assert all(len(s) == 1 for s in by_true.values())
    assert len(set.union(*by_true.values())) == 3


def test_duckdb_mirror_parity(spark, emb):
    got = sorted(
        tuple(r) for r in cluster.kmeans_assign(emb, k=3, rounds=2, n=300).collect()
    )
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES %s) t(vec_id, embedding)"
        % ", ".join(
            "(%d, [%s]::FLOAT[])" % (i, ", ".join(repr(x) for x in v))
            for i, v in rows
        )
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(
            cluster.kmeans_assign_sql(k=3, rounds=2, dims=DIMS)
        ).fetchall()
    )
    assert got == ora


def test_topk_exact_within_probed_cells(spark, emb):
    # brute-force within the probed cells equals the operator's result
    got = cluster.kmeans_topk(
        emb, k_clusters=3, rounds=2, nprobe=2, k=5, n_queries=3, n=300
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.dist_q))
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort()
        dists = [d for _, _, d in rs]
        assert dists == sorted(dists)
        assert all(v != q for _, v, _ in rs)


def test_topk_recall_vs_bruteforce(spark, emb):
    # blobs are well separated: probing 2 of 3 cells must contain the true
    # top-5 (all true neighbors share the query's blob/cell)
    import math

    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()]
    q = {i: [math.floor(v * cluster.QUANT) for v in vec] for i, vec in rows}

    def brute(qid, k=5):
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(q[qid], v)), i)
            for i, v in q.items() if i != qid
        )
        return [(i, d) for d, i in ds[:k]]

    got = cluster.kmeans_topk(
        emb, k_clusters=3, rounds=2, nprobe=2, k=5, n_queries=3, n=300
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, {})[r.rank] = (r.vec_id, r.dist_q)
    for qid in (0, 1, 2):
        ref = brute(qid)
        ann = [by_q[qid][rk] for rk in sorted(by_q[qid])]
        assert ann == ref, qid


def test_topk_duckdb_mirror_parity(spark, emb):
    got = sorted(tuple(r) for r in cluster.kmeans_topk(
        emb, k_clusters=3, rounds=2, nprobe=2, k=5, n_queries=3, n=300
    ).collect())
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES %s) t(vec_id, embedding)"
        % ", ".join(
            "(%d, [%s]::FLOAT[])" % (i, ", ".join(repr(x) for x in v))
            for i, v in rows
        )
    )
    ora = sorted(tuple(r) for r in con.execute(cluster.kmeans_topk_sql(
        k_clusters=3, rounds=2, nprobe=2, k=5, n_queries=3, dims=DIMS
    )).fetchall())
    assert got == ora
