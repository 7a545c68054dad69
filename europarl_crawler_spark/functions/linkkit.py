"""HTML link absolutization — the reference's rewrite_links (F9).

Reference behavior (downloader.py:117-138, golden test
tests/downloader/test_downloader.py:6-18): make relative ``a href``,
``script src`` and ``img src`` absolute against a base URL; leave absolute
URLs and bare fragment anchors (#…) untouched. The reference uses
BeautifulSoup; this is an independent regex implementation of the same
contract (no HTML parser in the sandbox), exposed both as a Python function
(tests / control plane) and an Arrow pandas UDF for bulk HTML columns.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

_ATTR_RE = re.compile(
    r"""(?P<prefix>\b(?:href|src)\s*=\s*)(?P<q>["'])(?P<url>.*?)(?P=q)""",
    re.IGNORECASE | re.DOTALL,
)
_ABSOLUTE_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def rewrite_links(html: str, base_url: str) -> str:
    """Absolutize relative href/src values against base_url."""

    def fix(m: re.Match) -> str:
        url = m.group("url")
        if not url or url.startswith("#") or _ABSOLUTE_RE.match(url):
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{urljoin(base_url, url)}{m.group('q')}"

    return _ATTR_RE.sub(fix, html)


_UDF = None


def rewrite_links_col(html_col, base_col) -> Column:
    """Vectorized column form (Arrow batches; regex is C-backed)."""
    global _UDF
    if _UDF is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _rw(html: pd.Series, base: pd.Series) -> pd.Series:
            return pd.Series(
                [rewrite_links(h, b) if h is not None else None for h, b in zip(html, base)]
            )

        _UDF = _rw
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    b = F.col(base_col) if isinstance(base_col, str) else base_col
    return _UDF(h, b)
