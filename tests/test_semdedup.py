"""SemDeDup: the upper-triangular eps rule, identical-vector collapse,
and repartition invariance (cluster assignment itself is oracle-checked
by the dedup_semantic lane)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.operators.similarity import semdedup


def _corpus(spark, parts=4):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(40):
        v = rng.randn(8)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # planted exact duplicates of ids 3 and 7
    rows.append((103, rows[3][1]))
    rows.append((107, rows[7][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts), {r[0]: np.array(r[1]) for r in rows}


@pytest.fixture(scope="module")
def result(spark):
    df, vecs = _corpus(spark)
    out = semdedup(df, eps=0.9, n_cells=4, n=42, portable=True).collect()
    return out, vecs


def test_identical_vectors_collapse(result):
    out, _ = result
    by_id = {r["vec_id"]: r for r in out}
    for a, b in [(3, 103), (7, 107)]:
        assert by_id[a]["cell_id"] == by_id[b]["cell_id"]  # same assignment
        kept = [x for x in (a, b) if by_id[x]["keep"]]
        assert len(kept) == 1
        dropped = by_id[b if kept == [a] else a]
        assert dropped["dup_of"] is not None


def test_eps_rule_matches_numpy_reference(result):
    """Given the operator's own cell decomposition + ranks, the keep/dup_of
    columns must equal an independent numpy replay of the released
    SemDeDup rule: drop iff ANY earlier-ranked cell member (kept or not)
    has rounded cosine >= eps; dup_of = the earliest such member."""
    out, vecs = result
    cells: dict[int, list] = {}
    for r in out:
        cells.setdefault(r["cell_id"], []).append(r)
    for members in cells.values():
        members.sort(key=lambda r: r["cell_rank"])
        assert [m["cell_rank"] for m in members] == list(
            range(1, len(members) + 1)
        )
        for i, ri in enumerate(members):
            dominators = []
            vi = vecs[ri["vec_id"]]
            for rj in members[:i]:
                vj = vecs[rj["vec_id"]]
                c = float(
                    np.dot(vi, vj)
                    / (np.linalg.norm(vi) * np.linalg.norm(vj))
                )
                if round(c, 6) >= 0.9:
                    dominators.append(rj)
            if dominators:
                assert not ri["keep"]
                assert ri["dup_of"] == dominators[0]["vec_id"]
            else:
                assert ri["keep"] and ri["dup_of"] is None


def test_repartition_invariant(spark, result):
    out, _ = result
    df, _ = _corpus(spark, parts=1)
    again = semdedup(df, eps=0.9, n_cells=4, n=42, portable=True).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(out) == key(again)


def test_eps_one_keeps_all_but_exact(spark):
    df, _ = _corpus(spark)
    out = semdedup(df, eps=1.0, n_cells=4, n=42, portable=True)
    dropped = out.filter(~F.col("keep")).collect()
    assert {r["vec_id"] for r in dropped} <= {3, 103, 7, 107}
    assert out.count() == 42
