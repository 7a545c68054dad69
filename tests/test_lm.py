"""CCNet perplexity bucketing (operators/lm.py): model sanity (costs track
n-gram familiarity), one-row-per-document contract incl. token-less docs,
shuffle/partitioning invariance of the integer cost sum, and exact
cross-engine parity with the DuckDB mirror that RETRAINS the whole model."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.operators import lm


@pytest.fixture(scope="module")
def docs(spark):
    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common) for i in range(40)]
    rows += [(100 + i, f"zyx{i}q wvut{i} bizarre glyph corpus outlier {i}") for i in range(6)]
    rows.append((900, ""))  # token-less doc must stay in-band
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_one_row_per_doc_and_empty_doc_contract(docs):
    got = lm.perplexity_bucket(docs)
    assert got.count() == docs.count()
    empty = got.filter(F.col("doc_id") == 900).collect()[0]
    assert empty.n_tokens == 0
    assert empty.cost_q == 0
    assert empty.nats_per_token is None
    assert empty.bucket == "head"


def test_familiar_text_costs_less_than_outliers(docs):
    got = {r.doc_id: r for r in lm.perplexity_bucket(docs).collect()}
    common_nats = got[0].nats_per_token
    outlier_nats = min(
        got[k].nats_per_token for k in got if 100 <= k < 110
    )
    assert common_nats < outlier_nats


def test_cost_sum_is_partitioning_invariant(docs):
    a = {(r.doc_id, r.cost_q) for r in lm.perplexity_bucket(docs).collect()}
    b = {
        (r.doc_id, r.cost_q)
        for r in lm.perplexity_bucket(docs.repartition(7, "text")).collect()
    }
    assert a == b


def test_duckdb_mirror_bit_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.doc_id: (r.n_tokens, r.cost_q, r.nats_per_token, r.bucket)
        for r in lm.perplexity_bucket(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(lm.perplexity_bucket_sql()).fetchall()
    }
    assert got == want


def test_buckets_split_the_synthetic_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {
        r.bucket: r.n
        for r in lm.perplexity_bucket(docs)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # pinned tercile cuts: every bucket must be populated
    assert set(counts) == {"head", "middle", "tail"}
