"""HTML text + link extraction — the reference's extraction surface.

The reference's postprocessors parse fetched HTML with BeautifulSoup
(europarl/rules/extraction.py; downloader.py rewrites links). This kit is
the stdlib-``html.parser`` equivalent for the Spark pipeline: visible-text
extraction (``<script>``/``<style>`` contents skipped, entities decoded,
whitespace normalized), ``<title>`` capture, ``a[href]`` link collection,
and a start-tag count — the standard (text, links, title) triple a crawl's
extract stage feeds to the text-curation operators and the frontier
(discovered links → canonicalize → anti-join vs seen, plans/frontier.py J2).

Contract notes:
- text = every character-data segment outside script/style/title, entity-
  decoded by the parser, then whitespace-normalized (runs of
  ``[ \\t\\n\\r\\f\\v]`` collapse to one space, ends trimmed) — the same
  normalization the oracle applies relationally;
- links are collected in document order, fragments and absolute URLs
  included verbatim (absolutization is linkkit.rewrite_links' job);
- malformed nesting is handled the way html.parser does (tolerant, no
  raise) — a crawler must not die on tag soup; ``extract`` only raises on
  non-string input.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"[ \t\n\r\f\v]+")

_VOID_SKIP = {"script", "style"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self.n_tags = 0
        self._skip = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        self.n_tags += 1
        if tag in _VOID_SKIP:
            self._skip += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in _VOID_SKIP and self._skip:
            self._skip -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            self.parts.append(data)


def extract(html: str) -> dict:
    """→ {title, text, links, n_tags} per the module contract."""
    if not isinstance(html, str):
        raise ValueError("htmlkit: input must be a str")
    p = _Extractor()
    p.feed(html)
    p.close()
    return {
        "title": _WS.sub(" ", "".join(p.title_parts)).strip(),
        "text": _WS.sub(" ", "".join(p.parts)).strip(),
        "links": p.links,
        "n_tags": p.n_tags,
    }
