"""Property test: canonicalize_expr (JVM column expression) must agree with
canonicalize_py (driver-side twin) on arbitrary URLs — the seen-set key
derivation has two implementations and they may never drift.

Hypothesis generates the corpus; all examples are evaluated in ONE Spark job
(per-example Spark round trips would be pathologically slow)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from europarl_crawler_spark.functions.urlkit import (
    canonicalize_py,
    host_of_py,
    canonicalize_expr,
    host_expr,
)

_scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
_host = st.from_regex(r"[a-zA-Z0-9.-]{1,20}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.from_regex(r"(/[a-zA-Z0-9._~%-]{0,10}){0,4}", fullmatch=True)
_query = st.sampled_from(["", "?", "?a=1", "?a=1&b=x%20y"])
_frag = st.sampled_from(["", "#", "#frag"])


@st.composite
def urls(draw):
    return (
        draw(_scheme) + "://" + draw(_host) + draw(_port)
        + draw(_path) + draw(_query) + draw(_frag)
    )


def _collect_examples(n=300):
    out = []

    @settings(max_examples=n, database=None, deadline=None)
    @given(urls())
    def gen(u):
        out.append(u)

    gen()
    return sorted(set(out))


def test_canonicalize_expr_matches_python(spark):
    corpus = _collect_examples()
    assert len(corpus) > 50
    df = spark.createDataFrame([(u,) for u in corpus], "url string")
    got = {
        r.url: (r.canon, r.host)
        for r in df.select(
            "url",
            canonicalize_expr("url").alias("canon"),
            host_expr("url").alias("host"),
        ).collect()
    }
    mismatches = []
    for u in corpus:
        want = (canonicalize_py(u), host_of_py(u))
        if got[u] != want:
            mismatches.append((u, got[u], want))
    assert not mismatches, mismatches[:5]


def test_canonical_idempotent(spark):
    corpus = _collect_examples(150)
    df = spark.createDataFrame([(u,) for u in corpus], "url string")
    twice = df.select(
        canonicalize_expr("url").alias("c1"),
        canonicalize_expr(canonicalize_expr("url")).alias("c2"),
    )
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0
