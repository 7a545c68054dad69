"""robots.txt parsing + frontier gating (north_rule's robots surface)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.plans.robots import (
    apply_robots_gate,
    parse_robots,
    robots_df,
)

ROBOTS_TXT = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: SpecialBot
Disallow: /
"""


def test_parse_robots():
    rules = parse_robots(ROBOTS_TXT)
    # only the '*' group applies; SpecialBot's rules are ignored
    assert ("/private/", False) in rules
    assert ("/private/ok/", True) in rules
    assert ("/tmp", False) in rules
    assert ("/", False) not in rules


@pytest.fixture(scope="module")
def frontier(spark):
    from europarl_crawler_spark.functions.urlkit import host_hash_expr, salt_expr

    urls = [
        "https://site.example.org/public/a",
        "https://site.example.org/private/a",
        "https://site.example.org/private/ok/a",
        "https://site.example.org/tmpfile",
        "https://other.example.org/private/a",  # no robots for this host
    ]
    return (
        spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "url_id long, url string")
        .withColumn("host_hash", host_hash_expr("url"))
        .withColumn("salt", salt_expr("url").cast("int"))
    )


def test_apply_robots_gate(spark, frontier):
    robots = robots_df(spark, {"site.example.org": ROBOTS_TXT})
    kept = {r.url for r in apply_robots_gate(frontier, robots).collect()}
    assert "https://site.example.org/public/a" in kept
    assert "https://site.example.org/private/a" not in kept  # disallowed
    assert "https://site.example.org/private/ok/a" in kept  # longest-prefix Allow
    assert "https://site.example.org/tmpfile" not in kept  # prefix match
    assert "https://other.example.org/private/a" in kept  # host without robots


def test_equal_length_tie_allow_wins(spark, frontier):
    """Equal-length Allow and Disallow prefixes: Allow wins the tie (the
    public robots.txt convention — ADVICE r1)."""
    tie_txt = "User-agent: *\nDisallow: /private/\nAllow: /private/\n"
    robots = robots_df(spark, {"site.example.org": tie_txt})
    kept = {r.url for r in apply_robots_gate(frontier, robots).collect()}
    assert "https://site.example.org/private/a" in kept
    assert "https://site.example.org/private/ok/a" in kept


def test_p11_query_branches(spark):
    """Query-level branches of the oracle-checked p11_robots_gate: rule-less
    odd hosts pass, /en blocked on even hosts, /en/d1* re-allowed by prefix,
    /fr/d2* equal-length tie -> Allow wins, /zh/d3* blocked."""
    import __spark_entry__ as entry

    kept = {r["url"] for r in entry.q_p11_robots_gate(spark, "/root/testdata/sf0.001").collect()}
    src_all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    urls = {
        (r["source"], r["lang"], r["doc_id"] % 50): (
            f"https://{r['source']}.example/{r['lang']}/d{r['doc_id'] % 50}"
        )
        for r in src_all.collect()
    }
    for (src, lang, d), u in urls.items():
        even = int(src[3:]) % 2 == 0 and int(src[3:]) < 20
        if not even:
            assert u in kept, u  # no robots -> allowed
        elif lang == "en":
            assert (u in kept) == (str(d).startswith("1")), u
        elif lang == "fr" and str(d).startswith("2"):
            assert u in kept, u  # tie -> Allow wins
        elif lang == "zh" and str(d).startswith("3"):
            assert u not in kept, u
        else:
            assert u in kept, u


def test_parse_robots_edge_cases():
    """Pure-parser branches: comments stripped, unknown directives ignored,
    only the '*' agent group applies, empty Disallow (allow-all idiom)
    produces no rule, directives before any User-agent line are ignored."""
    from europarl_crawler_spark.plans.robots import parse_robots

    txt = (
        "Disallow: /orphan\n"           # before any User-agent: ignored
        "User-agent: googlebot\n"
        "Disallow: /google-only\n"       # non-* group: ignored
        "User-agent: *\n"
        "# comment line\n"
        "Crawl-delay: 10\n"              # unknown directive: ignored
        "Disallow: /a # trailing comment\n"
        "Disallow:\n"                    # empty value: allow-all idiom, no rule
        "Allow: /a/b\n"
        "User-agent: bingbot\n"
        "Disallow: /bing-only\n"         # later non-* group: ignored
    )
    assert parse_robots(txt) == [("/a", False), ("/a/b", True)]


def test_parse_robots_case_and_whitespace():
    from europarl_crawler_spark.plans.robots import parse_robots

    txt = "USER-AGENT: *\n  DISALLOW :  /x  \nallow: /x/y\n"
    # keys are case-insensitive and whitespace-tolerant; values keep case
    assert parse_robots(txt) == [("/x", False), ("/x/y", True)]


def test_parse_crawl_delay():
    from europarl_crawler_spark.plans.robots import parse_crawl_delay

    txt = (
        "User-agent: googlebot\n"
        "Crawl-delay: 99\n"             # non-* group: ignored
        "User-agent: *\n"
        "Crawl-delay: nonsense\n"       # invalid: ignored
        "Crawl-delay: -5\n"             # negative: ignored
        "Crawl-delay: 2.5\n"            # last valid in-group value wins
        "User-agent: bingbot\n"
        "Crawl-delay: 42\n"             # later non-* group: ignored
    )
    assert parse_crawl_delay(txt) == 2.5
    assert parse_crawl_delay("User-agent: *\nDisallow: /a\n") is None
    assert parse_crawl_delay("CRAWL-DELAY: 7\n") is None  # before any group


def test_crawl_delay_floors_budget(spark):
    from europarl_crawler_spark.plans.politeness import host_budgets
    from europarl_crawler_spark.plans.robots import DELAY_SCHEMA

    hosts = spark.createDataFrame([(1,), (2,), (3,)], "host_hash long")
    politeness = spark.createDataFrame(
        [], "host_hash long, interval_secs double, last_check double, next_check double"
    )
    delays = spark.createDataFrame([(1, 60.0), (2, 1.0), (3, 1200.0)], DELAY_SCHEMA)
    got = {
        r.host_hash: r.budget
        for r in host_budgets(
            hosts, politeness, epoch_secs=600.0, min_interval_secs=3.0,
            crawl_delays=delays,
        ).collect()
    }
    # host 1: delay 60 floors the default 3s interval -> 600/60 = 10
    assert got[1] == 10
    # host 2: delay 1 < min interval 3 -> politeness interval rules, 600/3
    # capped at bucket capacity 100
    assert got[2] == 100
    # host 3: delay 1200 > epoch -> budget 0 -> dropped this epoch
    assert 3 not in got
    # without the dimension nothing changes
    base = {
        r.host_hash: r.budget
        for r in host_budgets(hosts, politeness, 600.0, 3.0).collect()
    }
    assert base == {1: 100, 2: 100, 3: 100}


def test_engine_honors_crawl_delay(spark, tmp_path):
    """End-to-end: a robots Crawl-delay of 30s on a 600s epoch caps every
    host at 20 requests/epoch (vs the default-interval cap of 100)."""
    from datetime import date, datetime, timezone

    from pyspark.sql import functions as F

    from europarl_crawler_spark.plans.epoch import CrawlEngine
    from europarl_crawler_spark.plans.robots import DELAY_SCHEMA
    from europarl_crawler_spark.sources.epochstore import EpochStore
    from europarl_crawler_spark.sources.synthetic import session_days_df, simulated_web

    days = session_days_df(spark, start=date(2019, 7, 2), n_days=12)
    web = simulated_web(spark, days)
    web.write.parquet(str(tmp_path / "web"))
    web = spark.read.parquet(str(tmp_path / "web"))
    from europarl_crawler_spark.functions.urlkit import host_hash_expr

    delays = (
        web.select(host_hash_expr("url").alias("host_hash"))
        .distinct()
        .withColumn("crawl_delay", F.lit(30.0))
    )
    delays = spark.createDataFrame(delays.collect(), DELAY_SCHEMA)
    eng = CrawlEngine(
        spark, EpochStore(tmp_path / "store"), web,
        prefetch_limit=50, epoch_secs=600.0, crawl_delays=delays,
    )
    eng.bootstrap(days)
    eng.run(3, start=datetime(2021, 1, 1, tzinfo=timezone.utc))
    per = (
        eng.store.read("requests", spark)
        .groupBy("epoch", "host_hash")
        .count()
        .collect()
    )
    assert per and all(r["count"] <= 20 for r in per)


# ---- RFC 9309 upgrade: wildcards, $ anchor, group selection ----------------


def test_pattern_regex_dialect():
    import re

    from europarl_crawler_spark.plans.robots import pattern_regex

    assert pattern_regex("/fish") == "^/fish"
    assert pattern_regex("/fish*") == "^/fish.*"
    assert pattern_regex("/*.php$") == "^/.*\\.php$"
    # the restricted dialect behaves identically in python re (and hence
    # Java regex / RE2, which share it): spec examples
    rx = re.compile(pattern_regex("/fish*.php$"))
    assert rx.match("/fishheads/catfish.php")
    assert not rx.match("/fish.php?id=1")  # $ anchors the end


def test_group_selection_specific_beats_wildcard():
    from europarl_crawler_spark.plans.robots import parse_robots

    txt = (
        "User-agent: other-bot\nDisallow: /decoy\n\n"
        "User-agent: europarl-crawler-spark\nDisallow: /mine\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    assert parse_robots(txt, "europarl-crawler-spark") == [("/mine", False)]
    assert parse_robots(txt, "europarl-crawler-spark/0.4") == [("/mine", False)]
    assert parse_robots(txt, "unrelated-bot") == [("/", False)]
    assert parse_robots(txt) == [("/", False)]  # legacy: '*' group


def test_group_selection_longest_token_and_merge():
    from europarl_crawler_spark.plans.robots import parse_robots

    txt = (
        "User-agent: euro\nDisallow: /a\n\n"
        "User-agent: europarl-crawler-spark\nDisallow: /b\n\n"
        "User-agent: europarl-crawler-spark\nDisallow: /c\n"
    )
    # longest matching token wins; its two groups MERGE
    assert parse_robots(txt, "europarl-crawler-spark") == [
        ("/b", False), ("/c", False),
    ]
    assert parse_robots(txt, "eurosomething") == [("/a", False)]


def test_shared_agent_lines_and_empty_disallow():
    from europarl_crawler_spark.plans.robots import parse_robots

    txt = (
        "User-agent: a-bot\nUser-agent: b-bot\n"
        "Disallow:\nDisallow: /x\n"
    )
    # consecutive User-agent lines share the group; empty Disallow is a no-op
    assert parse_robots(txt, "a-bot") == [("/x", False)]
    assert parse_robots(txt, "b-bot") == [("/x", False)]


def test_wildcard_gate_end_to_end(spark):
    from europarl_crawler_spark.functions.urlkit import host_hash_expr
    from europarl_crawler_spark.plans.robots import apply_robots_gate, robots_df

    txt = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Allow: /ok/*.pdf$\n"
        "Disallow: /tmp*junk\n"
    )
    urls = [
        "https://h.example/a.pdf",         # blocked by /*.pdf$
        "https://h.example/a.pdf.txt",     # NOT blocked ($ anchor)
        "https://h.example/ok/a.pdf",      # re-allowed (longer pattern)
        "https://h.example/tmp123junk",    # mid-pattern wildcard blocks
        "https://h.example/tmpclean",      # no match
    ]
    fb = (
        spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "url_id long, url string"
        )
        .withColumn("host_hash", host_hash_expr("url"))
    )
    robots = robots_df(spark, {"h.example": txt})
    kept = {r.url for r in apply_robots_gate(fb, robots).collect()}
    assert kept == {
        "https://h.example/a.pdf.txt",
        "https://h.example/ok/a.pdf",
        "https://h.example/tmpclean",
    }


def test_sitemap_directives():
    from europarl_crawler_spark.plans.robots import parse_sitemaps

    txt = (
        "Sitemap: https://h/s1.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://h/s2.xml  # trailing comment\n"
        "Sitemap: https://h/s1.xml\n"   # duplicate dropped
        "Sitemap: /relative.xml\n"      # not absolute: ignored
    )
    assert parse_sitemaps(txt) == ["https://h/s1.xml", "https://h/s2.xml"]
