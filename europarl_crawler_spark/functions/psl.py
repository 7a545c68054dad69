"""Registrable-domain extraction (public-suffix algorithm) + domain rollup.

Per-HOST politeness is not enough on the real web: `a.example.com` and
`b.example.com` are one operator, and crawlers aggregate budgets, seen
stats, and frontier shards at the REGISTRABLE DOMAIN (eTLD+1). This module
implements the publicsuffix.org algorithm — longest-matching suffix rule,
wildcard (``*.``) rules, exception (``!``) rules, unknown TLD fallback —
over an EMBEDDED rule subset (the algorithm is the deliverable; production
swaps in the full public-suffix list, ~9k rules, still broadcast-trivial).

Two implementations, value-locked to each other:
- ``registrable_domain_py``: the reference scalar (tests, control plane);
- ``domain_rollup``: the DataFrame form — hosts join the BROADCAST rule
  dimension on a label-suffix predicate, precedence = exception first then
  most labels, registrable = suffix + one label via array slicing. Pure
  Catalyst (no UDF), one window keyed by host, mirrored relationally in
  DuckDB by ``domain_rollup_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Embedded subset of the public suffix list: enough to exercise every rule
# class (plain TLD, multi-label suffix, wildcard, exception). Production
# swaps in the full list — same algorithm, same plan.
SUFFIX_RULES: list[str] = [
    "com", "org", "net", "edu", "gov", "io", "ai", "co", "uk", "de", "fr",
    "jp", "au", "example",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au",
    "co.jp",
    "github.io",
    "*.ck",
    "!www.ck",
]


def _rule_rows() -> list[tuple[str, int, bool, bool]]:
    """(suffix-body, n_labels, is_wildcard, is_exception) per rule; the
    body drops the '*.'/'!' markers. n_labels counts the labels of the
    PUBLIC SUFFIX the rule denotes (wildcard adds one for the '*')."""
    rows = []
    for r in SUFFIX_RULES:
        if r.startswith("!"):
            body = r[1:]
            # exception: the public suffix is the rule minus its leftmost
            # label — denote by (body, labels(body)-1)
            rows.append((body, len(body.split(".")) - 1, False, True))
        elif r.startswith("*."):
            body = r[2:]
            rows.append((body, len(body.split(".")) + 1, True, False))
        else:
            rows.append((r, len(r.split(".")), False, False))
    return rows


def registrable_domain_py(host: str) -> str | None:
    """Reference scalar implementation of the PSL algorithm. None when the
    host IS a public suffix (no registrable domain), e.g. 'co.uk'.
    Unknown TLDs fall back to the implicit '*' rule (last label)."""
    labels = host.lower().rstrip(".").split(".")
    best: tuple[int, int] | None = None  # (is_exception, suffix_labels)
    for body, n, wild, exc in _rule_rows():
        bl = body.split(".")
        if exc or not wild:
            match = labels[-len(bl):] == bl if len(labels) >= len(bl) else False
        else:
            match = (
                len(labels) >= len(bl) + 1 and labels[-len(bl):] == bl
            )
        if not match:
            continue
        cand = (1 if exc else 0, n)
        if best is None or cand > best:
            best = cand
    n_suffix = best[1] if best is not None else 1  # implicit '*' rule
    if len(labels) <= n_suffix:
        return None
    return ".".join(labels[-(n_suffix + 1):])


def rules_df(spark) -> DataFrame:
    return spark.createDataFrame(
        _rule_rows(), "body string, n_suffix int, wild boolean, exc boolean"
    )


def domain_rollup(
    urls: DataFrame, host_col: str = "host"
) -> DataFrame:
    """hosts → (host, domain) with the PSL precedence, pure Catalyst:
    broadcast rule join on an ends-with-label predicate, exception-then-
    longest window per host, registrable = last (n_suffix+1) labels.
    Hosts that ARE a public suffix get domain NULL."""
    spark = urls.sparkSession
    rules = rules_df(spark)
    h = F.lower(F.col(host_col))
    base = urls.select(
        F.col(host_col).alias("host"), F.split(h, r"\.").alias("_labels")
    )
    r = rules.select("body", "n_suffix", "wild", "exc")
    nl = F.size("_labels")
    body_labels = F.split(F.col("body"), r"\.")
    nb = F.size(body_labels)
    ends_with_body = F.concat_ws(".", F.col("_labels")).endswith(
        F.concat(F.lit("."), F.col("body"))
    ) | (F.concat_ws(".", F.col("_labels")) == F.col("body"))
    match = F.when(F.col("wild"), ends_with_body & (nl >= nb + 1)).otherwise(
        ends_with_body
    )
    joined = base.join(F.broadcast(r), match, "left")
    w = Window.partitionBy("host").orderBy(
        F.desc(F.coalesce("exc", F.lit(False))),
        F.desc(F.coalesce("n_suffix", F.lit(1))),
        F.asc("body"),
    )
    picked = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn("_ns", F.coalesce("n_suffix", F.lit(1)))
    )
    dom = F.when(
        F.size("_labels") > F.col("_ns"),
        F.concat_ws(
            ".",
            F.slice("_labels", F.size("_labels") - F.col("_ns"), F.col("_ns") + 1),
        ),
    )
    return picked.select("host", dom.alias("domain"))


def rules_values_sql() -> str:
    vals = ", ".join(
        f"('{b}', {n}, {str(w).upper()}, {str(e).upper()})"
        for b, n, w, e in _rule_rows()
    )
    return f"(SELECT * FROM (VALUES {vals}) t(body, n_suffix, wild, exc))"


def domain_rollup_sql(hosts_sql: str) -> str:
    """DuckDB mirror of :func:`domain_rollup` over a (host) subquery."""
    return f"""
WITH hosts AS (SELECT host, string_split(lower(host), '.') AS labels
               FROM ({hosts_sql}) hh),
m AS (
  SELECT h.host, h.labels, r.body, r.n_suffix, r.exc
  FROM hosts h JOIN {rules_values_sql()} r
    ON (lower(h.host) = r.body OR ends_with(lower(h.host), '.' || r.body))
   AND (NOT r.wild OR len(h.labels) >= len(string_split(r.body, '.')) + 1)
),
picked AS (
  SELECT host, labels, coalesce(n_suffix, 1) AS ns
  FROM (
    SELECT h.host, h.labels, m.n_suffix,
           row_number() OVER (
             PARTITION BY h.host
             ORDER BY coalesce(m.exc, FALSE) DESC,
                      coalesce(m.n_suffix, 1) DESC, m.body ASC) AS rn
    FROM hosts h LEFT JOIN m ON h.host = m.host)
  WHERE rn = 1
)
SELECT host,
       CASE WHEN len(labels) > ns
            THEN array_to_string(labels[len(labels) - ns:], '.')
       END AS domain
FROM picked
"""
