"""Sitemap protocol: build/parse round trip, tree walk, malformed feeds."""

from __future__ import annotations

from datetime import date

import pytest

from europarl_crawler_spark.sources import sitemap as sm


def test_urlset_roundtrip_typed():
    entries = [
        {"loc": "https://h/1", "lastmod": date(2021, 2, 3),
         "changefreq": "daily", "priority": "0.7"},
        {"loc": "https://h/2"},  # optional fields absent
    ]
    kind, got = sm.parse_sitemap(sm.sitemap_xml(entries))
    assert kind == "urlset"
    assert got[0] == {
        "loc": "https://h/1", "lastmod": date(2021, 2, 3),
        "changefreq": "daily", "priority": 0.7,
    }
    assert got[1] == {
        "loc": "https://h/2", "lastmod": None,
        "changefreq": None, "priority": None,
    }


def test_index_walk():
    kids = {
        "https://h/s-0.xml": sm.sitemap_xml([{"loc": "https://h/a"}]),
        "https://h/s-1.xml": sm.sitemap_xml([{"loc": "https://h/b"}]),
    }
    idx = sm.sitemap_index_xml(sorted(kids))
    out = sm.walk_host(idx, kids)
    assert [e["loc"] for e in out] == ["https://h/a", "https://h/b"]


def test_index_missing_child_raises():
    idx = sm.sitemap_index_xml(["https://h/s-0.xml"])
    with pytest.raises(ValueError, match="missing child"):
        sm.walk_host(idx, {})


def test_nested_index_rejected():
    inner = sm.sitemap_index_xml(["https://h/s.xml"])
    idx = sm.sitemap_index_xml(["https://h/i.xml"])
    with pytest.raises(ValueError, match="nested"):
        sm.walk_host(idx, {"https://h/i.xml": inner})


def test_spec_cap_enforced():
    with pytest.raises(ValueError, match="cap"):
        sm.sitemap_xml([{"loc": f"u{i}"} for i in range(50_001)])


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"not xml at all <", "parse error"),
        (b'<?xml version="1.0"?><urlset><url><loc>x</loc></url></urlset>',
         "unexpected root"),  # missing namespace
        (sm.sitemap_xml([{"loc": "https://h/1"}]).replace(
            b"<loc>https://h/1</loc>", b""), "without <loc>"),
    ],
)
def test_malformed_raises(blob, msg):
    with pytest.raises(ValueError, match=msg):
        sm.parse_sitemap(blob)


def test_bad_changefreq_and_priority_raise():
    good = sm.sitemap_xml(
        [{"loc": "https://h/1", "changefreq": "daily", "priority": "0.5"}]
    )
    with pytest.raises(ValueError, match="changefreq"):
        sm.parse_sitemap(good.replace(b"daily", b"fortnightly"))
    with pytest.raises(ValueError, match="out of range"):
        sm.parse_sitemap(good.replace(b"0.5", b"1.5"))


def test_foreign_extensions_tolerated():
    """Spec: consumers must ignore unknown elements (news/image/video
    extensions ride inside <url>)."""
    blob = sm.sitemap_xml([{"loc": "https://h/1"}]).replace(
        b"</url>", b"<extra xmlns='urn:x'>z</extra></url>"
    )
    kind, got = sm.parse_sitemap(blob)
    assert kind == "urlset" and got[0]["loc"] == "https://h/1"


def test_discovery_path_sitemap_to_frontier(spark):
    """End-to-end discovery glue: robots Sitemap directive → sitemap tree
    walk → canonicalize+hash → exact anti-join vs the seen set — exactly
    how sitemap-discovered URLs enter the frontier (J2)."""
    from pyspark.sql import functions as F

    from europarl_crawler_spark.functions.seen import anti_join_seen
    from europarl_crawler_spark.functions.urlkit import (
        canonicalize_expr,
        url_hash_expr,
    )
    from europarl_crawler_spark.plans.robots import parse_sitemaps

    robots_txt = "Sitemap: https://h.example/sitemap-index.xml\nUser-agent: *\nDisallow:\n"
    [idx_url] = parse_sitemaps(robots_txt)
    kids = {
        f"{idx_url.rsplit('/', 1)[0]}/s-0.xml": sm.sitemap_xml(
            [{"loc": f"https://h.example/doc/{i}"} for i in range(0, 10, 2)]
        ),
        f"{idx_url.rsplit('/', 1)[0]}/s-1.xml": sm.sitemap_xml(
            [{"loc": f"https://H.EXAMPLE/doc/{i}"} for i in range(1, 10, 2)]
        ),
    }
    entries = sm.walk_host(sm.sitemap_index_xml(sorted(kids)), kids)
    cand = (
        spark.createDataFrame([(e["loc"],) for e in entries], "url string")
        .select(canonicalize_expr("url").alias("url"))
        .withColumn("url_hash", url_hash_expr("url"))
    )
    # seen: docs 0..4 already crawled (canonical lowercase form)
    seen = (
        spark.createDataFrame(
            [(f"https://h.example/doc/{i}",) for i in range(5)], "url string"
        )
        .select(url_hash_expr(canonicalize_expr("url")).alias("url_hash"))
    )
    fresh = {r["url"] for r in anti_join_seen(cand, seen).collect()}
    # host case differences canonicalize away: only 5..9 are new
    assert fresh == {f"https://h.example/doc/{i}" for i in range(5, 10)}
