"""Deterministic synthetic inputs: seed days + the simulated-web content store.

The reference crawls a real HTTP origin; the sandbox has no network, so the
fetch stage (plans/fetch.py) reads a *content-store table* instead — the
"simulated web" (SURVEY §1.4, operator S3/S4). Everything here is seeded and
content-addressed (url_hash) so any scale regenerates identically:

- ``session day exists``  ⇔ pmod(xxhash64(dates), 7) < 3  (~43% of days, the
  reference's real-world prior is "parliament met on some days"; HEAD probe
  200 vs 404 — reference workers/sessiondaychecker.py:126-139).
- permanent 404 slice     : pmod(url_hash, 11) == 0 on session days.
- flaky slice             : pmod(url_hash, 13) == 0 — fetch returns a
  dead-letter code (408/429/460/503, reference error lanes
  workers/documentdownloader.py:132-150) on most epochs and 200 on epochs
  where (url_hash mixed with epoch) % 4 == 0, so the retry lane (SURVEY J6)
  is exercised end-to-end and eventually drains.
- redirect slice          : pmod(url_hash, 17) == 0 — the origin serves the
  resource at ``final_url`` (= url + '?location=archive'); the fetch follows
  (allow_redirects=True in the reference, documentdownloader.py:97) and logs
  the final URL as ``requests.redirected_url`` (reference resp.url,
  documentdownloader.py:124, db/requests.py:39).

Pixel payloads are Philox-seeded noise keyed by url_hash; fmt is derived from
the rule's filetype (.html→ppm or png by hash parity, .pdf→raw, .xml→qraw) so
all four codecs — including the real zlib-compressed PNG lane — and the
lossy-PSNR invariant are exercised. Generation is mapInPandas (Arrow); the
per-row numpy work is fixture generation, not the crawl data path.
"""

from __future__ import annotations

from datetime import date
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import imaging
from ..functions.rules import rules_df, url_expr
from ..functions.urlkit import host_hash_expr, salt_expr, url_hash_expr
from .schema import WEB

SIZES = (8, 16, 32, 64)
FMT_BY_FILETYPE = {".html": "ppm", ".pdf": "raw", ".xml": "qraw"}


def session_days_df(
    spark: SparkSession, start: date = date(2019, 7, 2), n_days: int = 60
) -> DataFrame:
    """The seed domain: n_days consecutive candidate dates from ``start``.

    Reference analog: generate_series over the full parliament history
    (europarl/db/sessionDay.py:57-59); scale via n_days.
    """
    return (
        spark.range(n_days)
        .select(F.date_add(F.lit(start), F.col("id").cast("int")).alias("dates"))
        .select(F.xxhash64("dates").alias("date_id"), "dates")
    )


def day_exists_expr(dates_col="dates"):
    """Session-day existence predicate (drives HEAD-probe 200 vs 404)."""
    return F.pmod(F.xxhash64(dates_col), F.lit(7)) < 3


def candidate_urls(spark: SparkSession, days: DataFrame) -> DataFrame:
    """days × active rules with generated URL + hashes (J1 + F2 columns)."""
    rules = rules_df(spark, active_only=True)
    cand = days.crossJoin(F.broadcast(rules))
    url = url_expr("dates", "doc_code", "infix", "language", "filetype")
    return cand.select(
        "date_id",
        "rule_id",
        "dates",
        "rulename",
        "filetype",
        url.alias("url"),
    ).select(
        "*",
        url_hash_expr("url").alias("url_hash"),
        host_hash_expr("url").alias("host_hash"),
        salt_expr("url").alias("salt"),
    )


def _gen_payloads(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {
            "url_hash": pdf["url_hash"],
            "url": pdf["url"],
            "kind": pdf["kind"],
            "bytes": [],
            "w": [],
            "h": [],
            "fmt": [],
            "caption": [],
            "final_url": [],
        }
        for uh, url, rule, day, ftype, kind in zip(
            pdf["url_hash"], pdf["url"], pdf["rulename"], pdf["dates"],
            pdf["filetype"], pdf["kind"],
        ):
            if kind == "missing":
                out["bytes"].append(None)
                out["w"].append(None)
                out["h"].append(None)
                out["fmt"].append(None)
                out["caption"].append(None)
                out["final_url"].append(url)
                continue
            out["final_url"].append(
                url + "?location=archive" if kind == "redirect" else url
            )
            key = int(uh) & 0xFFFFFFFFFFFFFFFF  # two's-complement view of the long
            rng = np.random.Generator(np.random.Philox(key=key))
            w = int(SIZES[key % len(SIZES)])
            h = int(SIZES[(key >> 8) % len(SIZES)])
            fmt = FMT_BY_FILETYPE.get(ftype, "raw")
            if ftype == ".html" and key % 2:
                # the html lane serves genuine compressed formats: half PNG
                # (lossless zlib), a quarter baseline JPEG (lossy DCT at
                # JPEG_QUALITY — exercises the PSNR ≥ 40 dB extract invariant
                # on real compression artifacts)
                fmt = "jpeg" if key % 4 == 3 else "png"
            elif ftype == ".html" and key % 4 == 2 and w * h <= 256:
                # palette+LZW lane: GIF is served only where its exact
                # 256-entry palette always fits (≤256-pixel thumbnails);
                # larger html tiles keep ppm — the same content-driven
                # format choice a real image host makes
                fmt = "gif"
            elif ftype == ".html" and key % 4 == 0:
                # prefix-coded lossless lane: real VP8L WebP
                # (functions/webpkit.py) — the fourth compression family
                fmt = "webp"
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            out["bytes"].append(imaging.encode(px, fmt))
            out["w"].append(w)
            out["h"].append(h)
            out["fmt"].append(fmt)
            out["caption"].append(f"{rule} {day.isoformat()} #{key % 10000:04d}")
        yield pd.DataFrame(out)


def simulated_web(spark: SparkSession, days: DataFrame) -> DataFrame:
    """The content store: one row per candidate URL with kind + payload.

    Partitioned work: candidates are generated JVM-side (cross join + concat
    expressions), payloads in an Arrow mapInPandas pass.
    """
    # several rules generate the SAME url string (session_day ↔ protocol_en_pdf;
    # named_voting_fr_pdf ↔ _xml — reference quirk) but the web has ONE
    # resource per URL: dedupe deterministically (min rulename wins).
    from pyspark.sql import Window

    w = Window.partitionBy("url_hash").orderBy(F.asc("rulename"))
    cand = (
        candidate_urls(spark, days)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    kind = (
        F.when(~day_exists_expr("dates"), F.lit("missing"))
        .when(F.pmod(F.col("url_hash"), F.lit(11)) == 0, F.lit("missing"))
        .when(F.pmod(F.col("url_hash"), F.lit(13)) == 0, F.lit("flaky"))
        .when(F.pmod(F.col("url_hash"), F.lit(17)) == 0, F.lit("redirect"))
        .otherwise(F.lit("ok"))
    )
    with_kind = cand.select("url_hash", "url", "rulename", "dates", "filetype", kind.alias("kind"))
    return with_kind.mapInPandas(_gen_payloads, schema=WEB)


# epoch-dependent status for a fetched row — a pure column expression used by
# the fetch stage (plans/fetch.py). Flaky URLs succeed on epochs where the
# mixed hash ≡ 0 (mod 4); otherwise they return one of the reference's
# dead-letter/throttle codes (408 ReadTimeout, 460 RequestException — reference
# workers/documentdownloader.py:132-150 — plus 429/503 to drive the
# token-bucket truth table lanes).
_FLAKY_CODES = [503, 408, 429, 460]


def status_expr(kind_col, url_hash_col, epoch: int):
    mixed = F.pmod(
        F.xxhash64(url_hash_col, F.lit(int(epoch))), F.lit(4 * len(_FLAKY_CODES))
    )
    flaky_status = F.when(mixed < 4, F.lit(200))
    for i, code in enumerate(_FLAKY_CODES):
        flaky_status = flaky_status.when(
            F.pmod(mixed, F.lit(len(_FLAKY_CODES))) == i, F.lit(code)
        )
    return (
        F.when(kind_col == "ok", F.lit(200))
        # the fetch follows the redirect chain (allow_redirects=True) and the
        # target serves the payload: the OBSERVED status is the target's 200
        .when(kind_col == "redirect", F.lit(200))
        .when(kind_col == "missing", F.lit(404))
        .otherwise(flaky_status)
    )
