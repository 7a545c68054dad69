"""Public-suffix registrable-domain extraction: every rule class, and the
Catalyst form locked to the scalar reference."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.functions.psl import (
    domain_rollup,
    registrable_domain_py,
)

CASES = {
    "a.example.com": "example.com",
    "example.com": "example.com",
    "com": None,
    "b.co.uk": "b.co.uk",
    "x.b.co.uk": "b.co.uk",
    "co.uk": None,                    # a public suffix has no registrable
    "proj.github.io": "proj.github.io",
    "x.proj.github.io": "proj.github.io",
    "github.io": None,
    "deep.a.b.ck": "a.b.ck",          # wildcard *.ck
    "a.b.ck": "a.b.ck",
    "b.ck": None,
    "www.ck": "www.ck",               # exception !www.ck
    "sub.www.ck": "www.ck",
    "weird.zz": "weird.zz",           # unknown TLD: implicit '*'
    "zz": None,
    "UPPER.Example.COM": "example.com",
}


@pytest.mark.parametrize("host,want", sorted(CASES.items(), key=str))
def test_reference_scalar(host, want):
    assert registrable_domain_py(host) == want


def test_dataframe_form_matches_reference(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {r["host"]: r["domain"] for r in domain_rollup(df).collect()}
    assert got == CASES


def test_rollup_groups_subdomains(spark):
    hosts = ["a.example.com", "b.example.com", "c.a.example.com"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    doms = {r["domain"] for r in domain_rollup(df).collect()}
    assert doms == {"example.com"}
