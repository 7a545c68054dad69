"""Sliding-window chunking (operators/chunking.py): layout invariants
(coverage, overlap, tail), the window<=n edge family, and cross-engine
parity including the negative-numerator clamp case (DuckDB // truncates,
Spark floors — absorbed by greatest())."""

from __future__ import annotations

import duckdb
import pytest

from europarl_crawler_spark.operators import chunking

# word counts chosen around the edges: 0 (no chunks), 1, overlap, window-1,
# window, window+1, exact multi-stride boundaries, and a long tail
SIZES = [0, 1, 5, 31, 32, 33, 127, 128, 129, 224, 225, 320, 1000]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(SIZES)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_layout_invariants(docs):
    rows = chunking.chunk_windows(docs, window=128, overlap=32).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(SIZES):
        if n == 0:
            assert i not in by_doc
            continue
        cs = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in cs] == list(range(len(cs)))
        # full coverage, tail reached
        assert cs[0].tok_start == 0 and cs[-1].tok_end == n
        for c in cs:
            assert c.n_chunk_tokens == c.tok_end - c.tok_start <= 128
        # consecutive overlap is exactly `overlap` except the final chunk
        for a, b in zip(cs, cs[1:]):
            assert b.tok_start == a.tok_start + 96
            if b.chunk_id < len(cs) - 1:
                assert a.tok_end - b.tok_start == 32
        # no chunk is empty
        assert all(c.n_chunk_tokens > 0 for c in cs)


def test_single_chunk_family(docs):
    rows = chunking.chunk_windows(docs, window=128, overlap=32).collect()
    k = {}
    for r in rows:
        k[r.doc_id] = max(k.get(r.doc_id, 0), r.chunk_id + 1)
    for i, n in enumerate(SIZES):
        if 1 <= n <= 128:
            assert k[i] == 1, (i, n)
        elif n == 129:
            assert k[i] == 2
        elif n == 224:  # 128 + 96: second chunk ends exactly at n
            assert k[i] == 2
        elif n == 225:
            assert k[i] == 3


def test_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunking.chunk_windows(docs, window=64, overlap=64)


def test_duckdb_mirror_parity(docs):
    got = sorted(
        tuple(r) for r in chunking.chunk_windows(docs, window=128, overlap=32).collect()
    )
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(SIZES)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join("(%d, '%s')" % r for r in rows)
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(
            chunking.chunk_windows_sql(window=128, overlap=32)
        ).fetchall()
    )
    assert got == ora
