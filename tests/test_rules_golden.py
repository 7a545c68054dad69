"""Golden URL + get_term tests ported from the reference
(tests/rules/test_protocol.py:8-111, tests/rules/test_rule.py:10-27),
run against BOTH the Python twin and the Spark column expression."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.functions.rules import (
    RULES,
    RULES_BY_NAME,
    build_url,
    get_term,
    rules_df,
    term_expr,
    url_expr,
)

GET_TERM_TABLE = [
    (date(2019, 8, 1), "9"),
    (date(2014, 8, 1), "8"),
    (date(2009, 8, 1), "7"),
    (date(2004, 8, 1), "6"),
    (date(1999, 8, 1), "5"),
    (date(1994, 8, 1), "4"),
    (date(1989, 8, 1), "3"),
    (date(1984, 8, 1), "2"),
    (date(1979, 8, 1), "1"),
    (date(1950, 8, 1), "0"),
    (date(2025, 8, 1), "0"),
    # strict '<' boundaries: 2019-07-01 is excluded from term 9 but falls
    # inside term 8's (2014-07-01, 2019-07-31) range — first match wins,
    # matching the reference's dict-insertion-order iteration (rule.py:46-61)
    (date(2019, 7, 1), "8"),
    (date(2024, 7, 31), "0"),
    (date(1979, 7, 1), "0"),
]

PROTOCOL_DATES = [d for d, _ in GET_TERM_TABLE[:11]]

GOLDEN_PDF = {
    date(2019, 8, 1): "https://europarl.europa.eu/doceo/document/PV-9-2019-08-01_EN.pdf",
    date(2014, 8, 1): "https://europarl.europa.eu/doceo/document/PV-8-2014-08-01_EN.pdf",
    date(2009, 8, 1): "https://europarl.europa.eu/doceo/document/PV-7-2009-08-01_EN.pdf",
    date(2004, 8, 1): "https://europarl.europa.eu/doceo/document/PV-6-2004-08-01_EN.pdf",
    date(1999, 8, 1): "https://europarl.europa.eu/doceo/document/PV-5-1999-08-01_EN.pdf",
    date(1994, 8, 1): "https://europarl.europa.eu/doceo/document/PV-4-1994-08-01_EN.pdf",
    date(1989, 8, 1): "https://europarl.europa.eu/doceo/document/PV-3-1989-08-01_EN.pdf",
    date(1984, 8, 1): "https://europarl.europa.eu/doceo/document/PV-2-1984-08-01_EN.pdf",
    date(1979, 8, 1): "https://europarl.europa.eu/doceo/document/PV-1-1979-08-01_EN.pdf",
    date(1950, 8, 1): "https://europarl.europa.eu/doceo/document/PV-0-1950-08-01_EN.pdf",
    date(2025, 8, 1): "https://europarl.europa.eu/doceo/document/PV-0-2025-08-01_EN.pdf",
}


@pytest.mark.parametrize("day,expected", GET_TERM_TABLE)
def test_get_term_py(day, expected):
    assert get_term(day) == expected


@pytest.mark.parametrize("day,expected", GOLDEN_PDF.items())
def test_protocol_en_pdf_py(day, expected):
    assert build_url(RULES_BY_NAME["protocol_en_pdf"], day) == expected


@pytest.mark.parametrize("day", PROTOCOL_DATES)
def test_protocol_en_html_py(day):
    assert (
        build_url(RULES_BY_NAME["protocol_en_html"], day)
        == GOLDEN_PDF[day].removesuffix(".pdf") + ".html"
    )


def test_all_rules_build_urls_py():
    d = date(1979, 7, 1)
    for r in RULES:
        u = build_url(r, d)
        assert u.startswith("https://europarl.europa.eu/doceo/document/")
        assert u.endswith(r.filetype)


def test_term_expr_spark(spark):
    df = spark.createDataFrame([(d,) for d, _ in GET_TERM_TABLE], "dates: date")
    got = {r["dates"]: r["term"] for r in df.select("dates", term_expr("dates").alias("term")).collect()}
    for d, expected in GET_TERM_TABLE:
        assert got[d] == expected, d


def test_url_expr_spark_matches_python_for_all_rules(spark):
    days = spark.createDataFrame([(d,) for d, _ in GET_TERM_TABLE], "dates: date")
    cand = days.crossJoin(F.broadcast(rules_df(spark)))
    got = cand.select("rulename", "dates", url_expr().alias("url")).collect()
    assert len(got) == len(GET_TERM_TABLE) * len(RULES)
    for row in got:
        assert row["url"] == build_url(RULES_BY_NAME[row["rulename"]], row["dates"])


def test_rules_dim_has_19_reference_names(spark):
    names = {r.name for r in RULES}
    expected = {
        "session_day",
        "protocol_en_pdf", "protocol_en_html", "protocol_de_pdf", "protocol_de_html",
        "word_protocol_en_pdf", "word_protocol_en_html", "word_protocol_de_pdf", "word_protocol_de_html",
        "agenda_en_pdf", "agenda_en_html", "agenda_de_pdf", "agenda_de_html",
        "daily_agenda_en_pdf", "daily_agenda_en_html", "daily_agenda_de_pdf", "daily_agenda_de_html",
        "voting_overview_en_pdf", "voting_overview_de_pdf", "voting_overview_en_html", "voting_overview_de_Html",
        "named_voting_fr_pdf", "named_voting_fr_xml",
    }
    assert expected <= names
    # the reference's named_voting_fr_pdf quirk: declared format is .xml
    assert RULES_BY_NAME["named_voting_fr_pdf"].filetype == ".xml"
