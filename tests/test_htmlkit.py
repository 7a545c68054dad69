"""HTML extraction: script/style skipping, entities, links, tag soup."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.functions.htmlkit import extract


def test_basic_extraction():
    got = extract(
        "<html><head><title> My  Title </title>"
        "<script>if (a<b) {x='<p>not text</p>'}</script></head>"
        "<body><h1>Head</h1>\n<p>body &amp; text</p>"
        '<a href="/x">one</a><a href="https://e/y">two</a>'
        "<style>p { color: red }</style></body></html>"
    )
    assert got["title"] == "My Title"
    # adjacent tags contribute no separator — data-exact extraction
    assert got["text"] == "Head body & textonetwo"
    assert got["links"] == ["/x", "https://e/y"]
    # html, head, title, script, body, h1, p, a, a, style
    assert got["n_tags"] == 10


def test_entities_and_charrefs_decode():
    got = extract("<p>caf&eacute; &#8212; 3 &lt; 4 &amp;&amp; 5 &gt; 2</p>")
    assert got["text"] == "café — 3 < 4 && 5 > 2"


def test_nested_script_style_skip_depth():
    got = extract("<script><style>junk</style>x</script><p>kept</p>")
    assert got["text"] == "kept"


def test_hrefless_and_empty_anchors():
    got = extract('<a name="top">t</a><a href="">e</a><a href="#f">f</a>')
    assert got["links"] == ["", "#f"]
    assert got["text"] == "tef"


def test_tag_soup_does_not_raise():
    got = extract("<p>unclosed <b>bold <a href='/z'>link</p></div></bogus>")
    assert got["links"] == ["/z"]
    assert "unclosed bold link" in got["text"]


def test_whitespace_normalization():
    got = extract("<p>a\t\tb\n\n c\r\nd</p>")
    assert got["text"] == "a b c d"


def test_non_string_raises():
    with pytest.raises(ValueError):
        extract(b"<p>bytes</p>")  # type: ignore[arg-type]
