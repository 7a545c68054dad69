"""robots.txt gating — new surface required by the north_rule.

The reference has no robots handling (its politeness is the token bucket);
the rebuild gates the frontier drain on a per-host disallow list. The parser
covers the public robots.txt subset that matters for gating: ``User-agent``
groups and ``Disallow``/``Allow`` path prefixes for the ``*`` agent.

Gating is a broadcast join (the robots dimension is n_hosts × few rules —
tiny next to the frontier) with a prefix predicate evaluated JVM-side via
``startswith`` — no UDF, no shuffle of the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)


def parse_robots(text: str) -> list[tuple[str, bool]]:
    """robots.txt → [(path_prefix, allow)] for User-agent: * (longest-match
    precedence is applied at gate time). Unknown directives ignored."""
    rules: list[tuple[str, bool]] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key in ("disallow", "allow") and val:
            rules.append((val, key == "allow"))
    return rules


def parse_crawl_delay(text: str) -> float | None:
    """``Crawl-delay`` (seconds) for the ``*`` group — the de-facto
    robots.txt extension (not in RFC 9309, honored by Bing/Yandex).
    Invalid or negative values are ignored; the last valid value in the
    ``*`` group wins (directives later in a group override earlier ones
    under the common longest-read convention)."""
    delay: float | None = None
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "crawl-delay":
            try:
                v = float(val)
            except ValueError:
                continue
            if v >= 0:
                delay = v
    return delay


DELAY_SCHEMA = T.StructType(
    [
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
    ]
)


def crawl_delays_df(spark: SparkSession, robots_by_host: dict[str, str]) -> DataFrame:
    """Per-host Crawl-delay dimension (hosts without a valid delay omitted).
    Joined into host_budgets as a broadcast — it is ≤ n_hosts rows of
    16 bytes, the same class as the politeness state table."""
    rows = []
    for host, text in sorted(robots_by_host.items()):
        d = parse_crawl_delay(text)
        if d is not None:
            rows.append((_host_hash_py(spark, host), float(d)))
    return spark.createDataFrame(rows, DELAY_SCHEMA)


def robots_df(spark: SparkSession, robots_by_host: dict[str, str]) -> DataFrame:
    """Build the robots dimension from {host: robots.txt text}."""
    rows = []
    for host, text in sorted(robots_by_host.items()):
        hh = _host_hash_py(spark, host)
        for prefix, allow in parse_robots(text):
            rows.append((hh, host, prefix, allow))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def _host_hash_py(spark: SparkSession, host: str) -> int:
    # one-row Spark eval keeps the hash bit-identical to the column expression
    from pyspark.sql import functions as F

    return spark.range(1).select(F.xxhash64(F.lit(host.lower()))).first()[0]


def path_expr(url_col) -> F.Column:
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#?]*)", 1)


def apply_robots_gate(frontier_batch: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop frontier rows whose URL path matches a disallow rule, honoring
    longest-prefix-wins with Allow overriding Disallow at equal length (the
    public robots.txt convention)."""
    fb = frontier_batch.withColumn("_path", path_expr("url"))
    matched = fb.join(
        F.broadcast(robots),
        (fb["host_hash"] == robots["host_hash"])
        & fb["_path"].startswith(robots["path_prefix"]),
        "left",
    ).select(
        fb["*"],
        robots["path_prefix"].alias("_prefix"),
        robots["allow"].alias("_allow"),
    )
    # longest matching rule per frontier row decides
    from pyspark.sql import Window

    # longest prefix first; at equal length Allow (true) sorts before
    # Disallow so Allow wins the tie — the public robots.txt convention
    w = Window.partitionBy("url_id").orderBy(F.desc(F.length("_prefix")), F.desc("_allow"))
    decided = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_allow").isNull() | F.col("_allow"))
        .drop("_rn", "_prefix", "_allow", "_path")
    )
    return decided
