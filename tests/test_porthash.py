"""Cross-engine parity of the portable hash family (functions/porthash.py):
the Spark column expressions and the DuckDB SQL mirrors must be
value-identical — this is the foundation the oracle-checked sketch lanes
(minhash/simhash/fingerprint) stand on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.functions import porthash as ph

STRINGS = [
    "hello",
    "World 42!",
    "x",
    "The quick brown fox jumps over the lazy dog",
    "  spaces  and\ttabs ",
    "'quote' \"dquote\" %percent% _under_",
]


@pytest.fixture(scope="module")
def both(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(STRINGS)], "id int, s string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(STRINGS)))
    return df, con


def test_poly_hash_parity(both):
    df, con = both
    got = {r.id: r.h for r in df.select("id", ph.poly_hash(F.col("s")).alias("h")).collect()}
    want = dict(con.execute(f"SELECT id, {ph.poly_hash_sql('s')} FROM t").fetchall())
    assert got == want
    assert all(0 <= v < ph.P for v in got.values())


def test_affine_and_fold_parity(both):
    df, con = both
    h = ph.poly_hash(F.col("s"))
    got = {
        r.id: (r.a0, r.a31, r.a63, r.fb)
        for r in df.select(
            "id",
            ph.affine(h, 0).alias("a0"),
            ph.affine(h, 31).alias("a31"),
            ph.affine(h, 63).alias("a63"),
            ph.fold_bucket([h, ph.affine(h, 1)]).alias("fb"),
        ).collect()
    }
    hs = ph.poly_hash_sql("s")
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            f"SELECT id, {ph.affine_sql(hs, 0)}, {ph.affine_sql(hs, 31)}, "
            f"{ph.affine_sql(hs, 63)}, "
            f"{ph.fold_bucket_sql([hs, ph.affine_sql(hs, 1)])} FROM t"
        ).fetchall()
    }
    assert got == want


def test_affine_family_distinct_and_deterministic():
    # constants must be a stable table (they're baked into oracle SQL) with
    # no degenerate members
    a2, b2 = ph._lcg_constants(64)
    assert a2 == ph.AFFINE_A and b2 == ph.AFFINE_B
    assert len(set(zip(ph.AFFINE_A, ph.AFFINE_B))) == 64
    assert all(1 <= a < ph.P for a in ph.AFFINE_A)
    assert all(0 <= b < ph.P for b in ph.AFFINE_B)


def test_portable_lanes_match_default_semantics(spark):
    # the portable hash changes bucket CONTENTS, never pair semantics:
    # minhash-LSH portable output must still be a subset of exact Jaccard
    # pairs (precision 1.0) at the same threshold
    from europarl_crawler_spark.operators import dedup

    rows = [(i, "the cat sat on the mat " * 8 + f"tail{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lsh = dedup.minhash_lsh_pairs(docs, k=16, bands=8, threshold=0.6, portable=True)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6)
    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    want = {(r.id_a, r.id_b) for r in exact.collect()}
    assert got <= want
    assert got  # near-identical docs must surface pairs
