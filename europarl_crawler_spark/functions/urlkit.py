"""URL canonicalization + hashing — the keys of the frontier and seen set.

north_rule requires the URL-seen set keyed by *canonicalized + hashed* URLs.
The reference's closest ancestor is rewrite_links (reference:
downloader.py:117-138) which absolutizes relative hrefs; full canonicalization
is new surface. All of it is column expressions (regexp + string builtins) so
it runs JVM-side over the full frontier; ``xxhash64`` is Spark's built-in
64-bit hash (stable across sessions/versions per its contract).

Python twins (canonicalize_py / host_of_py) exist for tests and the epoch
driver's control plane only — never on the data path.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_py(url: str) -> str:
    """Lowercase scheme+host, strip default port / fragment / trailing '?',
    empty path → '/'. Mirrors canonicalize_expr exactly (property-tested)."""
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    netloc = s.netloc.lower()
    if _DEFAULT_PORTS.get(scheme) and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = s.path or "/"
    return urlunsplit((scheme, netloc, path, s.query, ""))


def host_of_py(url: str) -> str:
    """Lowercased host with the SCHEME'S OWN default port stripped (http→:80,
    https→:443); a non-default port — e.g. http on :443 — is significant and
    kept. Mirrors host_expr exactly (property-tested)."""
    s = urlsplit(url)
    host = s.netloc.lower()
    p = _DEFAULT_PORTS.get(s.scheme.lower())
    if p and host.endswith(p):
        host = host[: -len(p)]
    return host


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def host_expr(url: Column | str) -> Column:
    """Extract the lowercased host, stripping only the scheme's own default
    port (http→:80, https→:443) — ports that don't match the scheme are
    significant and kept."""
    u = _c(url)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    return (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def canonicalize_expr(url: Column | str) -> Column:
    """Canonical URL as a single column expression.

    scheme→lower, host→lower minus default port, fragment stripped,
    empty path → '/', trailing bare '?' stripped.
    """
    u = F.trim(_c(url))
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = host_expr(u)
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 0)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_hash_expr(url: Column | str) -> Column:
    """Seen-set key: xxhash64 of the canonical URL (long)."""
    return F.xxhash64(canonicalize_expr(url))


def host_hash_expr(url: Column | str) -> Column:
    """Politeness partition key: xxhash64 of the host."""
    return F.xxhash64(host_expr(url))


def salt_expr(url: Column | str, n_salts: int = 16) -> Column:
    """Skew-defusal salt *within* a host: at 10^10 URLs over few hosts the
    host key is maximally skewed, so drains/joins repartition on
    (host_hash, salt). Budget is split across salts driver-side."""
    return F.pmod(F.xxhash64(canonicalize_expr(url), F.lit(0x5A17)), F.lit(n_salts))
