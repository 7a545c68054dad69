"""Deterministic corpus split/sample lanes (operators/sampling.py):
exhaustive-coverage and stability of the hash split, nested-subset property
of Bernoulli sampling, per-stratum fractions, and exact cross-engine parity
of every decision with the DuckDB SQL mirrors (the oracle-gate foundation)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.operators import sampling

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_split_covers_every_row_once(docs):
    got = sampling.split_assign(docs, WEIGHTS)
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # proportions track the weights (hash-uniformity at n=2000: ±6%)
    assert abs(counts["train"] / 2000 - 0.8) < 0.06
    assert abs(counts.get("val", 0) / 2000 - 0.1) < 0.06
    assert abs(counts.get("test", 0) / 2000 - 0.1) < 0.06


def test_split_is_partitioning_invariant(docs):
    a = sampling.split_assign(docs, WEIGHTS).select("doc_id", "split")
    b = sampling.split_assign(docs.repartition(13, "lang"), WEIGHTS).select(
        "doc_id", "split"
    )
    assert {(r.doc_id, r.split) for r in a.collect()} == {
        (r.doc_id, r.split) for r in b.collect()
    }


def test_sample_is_nested_by_fraction(docs):
    small = {r.doc_id for r in sampling.sample(docs, 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in sampling.sample(docs, 0.5).select("doc_id").collect()}
    assert small < big  # same hash member: lower threshold ⊂ higher threshold
    assert abs(len(big) / 2000 - 0.5) < 0.06


def test_sample_independent_of_split(docs):
    # split uses member 40, sample member 41: within the train split the
    # sample rate must stay ≈ the global fraction (no correlation)
    train = sampling.split_assign(docs, WEIGHTS).filter(F.col("split") == "train")
    n_train = train.count()
    kept = sampling.sample(train, 0.3).count()
    assert abs(kept / n_train - 0.3) < 0.06


def test_stratified_fractions_and_default(docs):
    got = sampling.stratified_sample(
        docs, {"en": 0.5, "de": 0.1}, strata_col="lang", default_fraction=0.0
    )
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in counts  # default 0.0 drops unlisted strata
    assert abs(counts["en"] / 667 - 0.5) < 0.1
    assert abs(counts["de"] / 667 - 0.1) < 0.1


def test_parity_with_duckdb(docs):
    """Every decision — split label, sample membership, stratified
    membership — must be bit-identical to the SQL mirrors."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, ["en", "de", "fr"][i % 3]) for i in range(2000)],
    )

    got_split = {
        r.doc_id: r.split
        for r in sampling.split_assign(docs, WEIGHTS).select("doc_id", "split").collect()
    }
    want_split = dict(
        con.execute(
            f"SELECT doc_id, {sampling.split_assign_sql(WEIGHTS)} FROM t"
        ).fetchall()
    )
    assert got_split == want_split

    got_sample = {
        r.doc_id for r in sampling.sample(docs, 0.3).select("doc_id").collect()
    }
    want_sample = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM t WHERE {sampling.sample_keep_sql(0.3)}"
        ).fetchall()
    }
    assert got_sample == want_sample

    fr = {"en": 0.5, "de": 0.1, "fr": 0.9}
    got_strat = {
        r.doc_id
        for r in sampling.stratified_sample(docs, fr).select("doc_id").collect()
    }
    want_strat = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM t WHERE {sampling.stratified_keep_sql(fr)}"
        ).fetchall()
    }
    assert got_strat == want_strat


def test_plan_is_shuffle_free(docs):
    """Scale shape: split and stratified sample must compile to a projection
    / broadcast-join + filter — no Exchange of the corpus."""
    plan = sampling.split_assign(docs, WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan2 = (
        sampling.stratified_sample(docs, {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchange allowed is the tiny dimension's broadcast
    assert "ShuffleExchange" not in plan2 and "Exchange hashpartitioning" not in plan2


def test_repeat_factor_counts_and_determinism(docs):
    """f=2.5 ⇒ every doc twice + ≈half a third time; f=0.4 ⇒ thinning;
    copy indices are dense 0..n-1 and identical across runs."""
    factors = {"en": 2.5, "de": 1.0, "fr": 0.4}
    got = sampling.repeat_factor_sample(docs, factors)
    per_doc = {
        (r.doc_id, r.lang): r.n
        for r in got.groupBy("doc_id", "lang").agg(F.count("*").alias("n")).collect()
    }
    en = [n for (_, lang), n in per_doc.items() if lang == "en"]
    assert set(en) <= {2, 3}
    assert abs(sum(en) / 667 - 2.5) < 0.1
    assert all(n == 1 for (_, lang), n in per_doc.items() if lang == "de")
    fr_docs = sum(1 for (_, lang) in per_doc if lang == "fr")
    assert abs(fr_docs / 667 - 0.4) < 0.1
    # dense copy range per doc
    mx = {
        r.doc_id: r.m
        for r in got.filter(F.col("lang") == "en")
        .groupBy("doc_id").agg(F.max("copy").alias("m")).collect()
    }
    for (doc, lang), n in per_doc.items():
        if lang == "en":
            assert mx[doc] == n - 1
    again = sampling.repeat_factor_sample(docs.repartition(7), factors)
    assert {(r.doc_id, r.copy) for r in got.filter(F.col("lang") == "en").collect()} == {
        (r.doc_id, r.copy) for r in again.filter(F.col("lang") == "en").collect()
    }


def test_repeat_factor_parity_with_duckdb(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, ["en", "de", "fr"][i % 3]) for i in range(2000)],
    )
    factors = {"en": 2.5, "de": 1.0, "fr": 0.4}
    n_sql = sampling.repeat_factor_n_sql(factors, default_factor=0.0)
    want = set(
        con.execute(
            "SELECT doc_id, unnest(generate_series(0, n_copies - 1)) FROM "
            f"(SELECT doc_id, {n_sql} AS n_copies FROM t) WHERE n_copies > 0"
        ).fetchall()
    )
    got = {
        (r.doc_id, r.copy)
        for r in sampling.repeat_factor_sample(docs, factors).select("doc_id", "copy").collect()
    }
    assert got == want


def test_repeat_factor_is_map_side(docs):
    plan = (
        sampling.repeat_factor_sample(docs, {"en": 2.0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


# ---- string (URL/UUID-style) ids: the r3 ADVICE trap ----


@pytest.fixture(scope="module")
def url_docs(spark):
    rows = [
        (f"https://src{i % 7}.example/en/d{i}", ["en", "de", "fr"][i % 3])
        for i in range(800)
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_string_ids_split_covers_all_and_spreads(url_docs):
    """Non-numeric ids must hash (not NULL out): every row gets a split and
    the distribution tracks the weights instead of collapsing into the
    last-named split."""
    got = sampling.split_assign(url_docs, WEIGHTS)
    counts = {
        r["split"]: r["n"]
        for r in got.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 800
    assert abs(counts["train"] / 800 - 0.8) < 0.08
    assert counts.get("test", 0) > 0 and counts.get("val", 0) > 0


def test_string_ids_sample_keeps_rows(url_docs):
    """sample() on URL ids must keep ≈fraction of rows — the pre-fix code
    silently dropped ALL rows (u was NULL)."""
    kept = sampling.sample(url_docs, 0.5).count()
    assert abs(kept / 800 - 0.5) < 0.08


def test_string_ids_parity_with_duckdb(url_docs, spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [
            (f"https://src{i % 7}.example/en/d{i}", ["en", "de", "fr"][i % 3])
            for i in range(800)
        ],
    )
    got = {
        r.doc_id: r.split
        for r in sampling.split_assign(url_docs, WEIGHTS)
        .select("doc_id", "split")
        .collect()
    }
    want = dict(
        con.execute(
            f"SELECT doc_id, {sampling.split_assign_sql(WEIGHTS)} FROM t"
        ).fetchall()
    )
    assert got == want
    got_s = {r.doc_id for r in sampling.sample(url_docs, 0.3).collect()}
    want_s = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM t WHERE {sampling.sample_keep_sql(0.3)}"
        ).fetchall()
    }
    assert got_s == want_s


def test_id_hash_edge_ids_parity(spark):
    """Numeric strings hash like their value; empty, 19-digit (would
    overflow a cast), and negative-integral ids agree across engines."""
    ids = ["123", "", "9999999999999999999", "-42", "René-éß", "a b\tc"]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", sampling.id_hash("doc_id", sampling.SPLIT_MEMBER).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = dict(
        con.execute(
            "SELECT doc_id, "
            + sampling.id_hash_sql("doc_id", sampling.SPLIT_MEMBER)
            + " FROM t"
        ).fetchall()
    )
    assert got == want
    # integral string == its long value's hash
    dfl = spark.createDataFrame([(123,), (-42,)], "doc_id long")
    got_l = {
        r["doc_id"]: r["h"]
        for r in dfl.select(
            "doc_id", sampling.id_hash("doc_id", sampling.SPLIT_MEMBER).alias("h")
        ).collect()
    }
    assert got_l[123] == got["123"] and got_l[-42] == got["-42"]


def test_importance_sample_bounds_and_determinism(spark):
    from europarl_crawler_spark.operators.sampling import importance_sample

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 / 10.0).alias("score"),  # 0.0 .. 0.9
    )
    kept = importance_sample(docs, "score")
    # score 0 rows can never survive; determinism: two runs identical
    assert kept.filter("score = 0.0").count() == 0
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in importance_sample(docs, "score").collect())
    assert a == b
    # keep-rate tracks the score (each score bucket has 200 rows)
    rates = {
        r.score: r.n / 200.0
        for r in kept.groupBy("score").agg(F.count("*").alias("n")).collect()
    }
    for s, rate in rates.items():
        assert abs(rate - s) < 0.12, (s, rate)
    # clamp: >1 always keeps, negative/NULL drops
    edge = spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (3, None)], "doc_id long, score double"
    )
    got = {r.doc_id for r in importance_sample(edge, "score").collect()}
    assert got == {1}
