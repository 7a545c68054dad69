"""BM25 retrieval (operators/retrieval.py): scoring against a hand-checked
reference implementation, ranking invariants, and cross-engine parity of
every quantized score with the DuckDB mirror."""

from __future__ import annotations

import math

import duckdb
import pytest

from europarl_crawler_spark.operators import retrieval


DOCS = [
    (0, "hash join hash join hash"),          # tf-heavy for query 1
    (1, "hash join order by key"),
    (2, "window sort merge sort"),
    (3, "the the the the the the the the"),   # long, matches nothing
    (4, "fast scan filter fast"),
    (5, "spark stream batch spark stream"),
    (6, "order order order"),
    (7, "hash"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_scores(query_terms: list[str], k1=1.2, b=0.75, quant=1 << 20):
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl_num = sum(len(v) for v in toks.values())
    out = {}
    for d, ts in toks.items():
        s = 0
        for q in set(query_terms):
            tf = ts.count(q)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (float(n - df) + 0.5) / (float(df) + 0.5))
            norm = (1.0 - b) + b * ((float(len(ts)) * n) / avgdl_num)
            s += math.floor(
                idf * (float(tf) * (k1 + 1.0)) / (float(tf) + k1 * norm)
                * float(quant)
            )
        if s:
            out[d] = s
    return out


def test_scores_match_reference(docs):
    got = {
        (r.query_id, r.doc_id): r.score_q
        for r in retrieval.bm25_topk(docs, k=10).collect()
    }
    for qid, qtext in retrieval.QUERIES:
        ref = _ref_scores(qtext.split())
        for d, s in ref.items():
            assert got[(qid, d)] == s, (qid, d)
        assert len([1 for (q, _) in got if q == qid]) == len(ref)


def test_rank_is_score_desc_docid_asc(docs):
    rows = retrieval.bm25_topk(docs, k=10).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        keys = [(-r.score_q, r.doc_id) for r in rs]
        assert keys == sorted(keys)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))


def test_ranking_properties(docs):
    rows = {
        (r.query_id, r.doc_id): r.rank
        for r in retrieval.bm25_topk(docs, k=10).collect()
    }
    # term coverage dominates: doc 1 matches all of "hash join order"
    assert rows[(1, 1)] == 1
    # higher tf at equal length class outranks a single occurrence
    assert rows[(1, 0)] < rows[(1, 7)]
    # a doc with no query terms never appears
    assert (1, 3) not in rows and (2, 3) not in rows


def test_duckdb_mirror_parity(docs):
    got = sorted(tuple(r) for r in retrieval.bm25_topk(docs, k=10).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join("(%d, '%s')" % r for r in DOCS)
    )
    ora = sorted(tuple(r) for r in con.execute(retrieval.bm25_topk_sql(k=10)).fetchall())
    assert got == ora


# ---- tf-idf keywords ----

def test_tfidf_prefers_rare_terms(spark):
    rows = [
        (0, "common common rare1 rare1 rare1"),
        (1, "common common common"),
        (2, "common rare2"),
        (3, "common filler other words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in retrieval.tfidf_keywords(df, k=2).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.tok, r.score_q))
    for d in got:
        got[d].sort()
    # rare terms outrank 'common' (df=4 -> idf=0 -> score 0)
    assert got[0][0][1] == "rare1"
    assert got[2][0][1] == "rare2"
    # idf of an every-doc term is exactly 0
    assert all(s == 0 for _, t, s in got[1] if t == "common")


def test_tfidf_duckdb_mirror_parity(spark):
    rows = [(i, t) for i, t in enumerate(
        ["alpha beta beta", "alpha gamma", "delta delta delta beta",
         "alpha alpha epsilon"] * 5
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in retrieval.tfidf_keywords(df, k=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
                % ", ".join("(%d, '%s')" % r for r in rows))
    ora = sorted(tuple(r) for r in con.execute(retrieval.tfidf_keywords_sql(k=3)).fetchall())
    assert got == ora
