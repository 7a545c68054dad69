"""Vectorized fetch-and-extract: the simulated HTTP stage + image extraction.

Reference analog: DocumentDownloader's GET + blob write + request log
(europarl/workers/documentdownloader.py:66-150, SURVEY S3/S5/D11/T6) and the
postprocessing extract stage (workers/postprocessingworker.py:37-65, F7/F8) —
collapsed into one pass because with a content-store join there is no I/O
boundary between "download" and "extract".

Physical shape:
- the "HTTP request" is an equi-join drained-batch ⋈ web content store on
  ``url_hash`` — at 10^10 scale this is THE big shuffle of an epoch; the
  drained side is budget-bounded (≤ Σ budgets rows/epoch) so AQE broadcasts
  it against the partitioned store when small enough.
- status codes are pure column expressions (epoch-dependent for flaky rows);
  the dead-letter lanes (408/429/460/5xx) stay in the request log and are
  re-drained by the retry rule next epoch.
- image decode + phash + validation run in ONE Arrow ``mapInPandas`` over the
  200-status slice only; per-element work is numpy (codec + DCT), never
  row-at-a-time Python UDFs (input_hint).
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import imaging
from ..sources.schema import DOCUMENTS
from ..sources.synthetic import status_expr

DEAD_LETTER = (408, 429, 460)  # + any 5xx; reference documentdownloader.py:132-150


def simulate_requests(
    drained: DataFrame, web: DataFrame, epoch: int, now: datetime
) -> DataFrame:
    """Join the drained frontier batch against the content store and produce
    the joined fetch result (one row per attempted URL, any status)."""
    w = web.select(
        "url_hash",
        F.col("kind"),
        F.col("bytes").alias("_body"),
        F.col("w").alias("_w"),
        F.col("h").alias("_h"),
        F.col("fmt").alias("_fmt"),
        F.col("caption").alias("_caption"),
    )
    joined = drained.join(w, "url_hash", "left")
    status = F.when(
        F.col("kind").isNull(), F.lit(404)  # URL not on the simulated web
    ).otherwise(status_expr(F.col("kind"), F.col("url_hash"), epoch))
    return (
        joined.withColumn("status_code", status)
        .withColumn("requested_at", F.lit(now))
        .withColumn("epoch", F.lit(int(epoch)))
        .withColumn("request_id", F.xxhash64("url_id", F.lit(int(epoch))))
    )


def requests_log(fetched: DataFrame) -> DataFrame:
    """Project the append-only crawl log rows (reference requests table)."""
    return fetched.select(
        "request_id",
        "url_id",
        "url_hash",
        "host_hash",
        "requested_at",
        "status_code",
        F.lit(None).cast("string").alias("redirected_url"),
        "epoch",
        "drain_seq",
    )


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        n = len(pdf)
        phash = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for i, (body, w, h, fmt) in enumerate(
            zip(pdf["_body"], pdf["_w"], pdf["_h"], pdf["_fmt"])
        ):
            try:
                px = imaging.decode(bytes(body), int(w), int(h), fmt)
                phash[i] = imaging.phash64(px)
            except Exception:
                ok[i] = False  # corrupt payload → drop row (dead-letter
                # handling for bodies; the request row already logged 200)
        out = pd.DataFrame(
            {
                "image_id": pdf["image_id"],
                "bytes": pdf["_body"],
                "w": pdf["_w"].astype("int32"),
                "h": pdf["_h"].astype("int32"),
                "fmt": pdf["_fmt"],
                "caption": pdf["_caption"],
                "phash": phash,
                "url_id": pdf["url_id"],
                "url": pdf["url"],
                "rulename": pdf["rulename"],
                "session_date": pdf["session_date"],
                "downloaded_at": pdf["requested_at"],
                "epoch": pdf["epoch"],
            }
        )
        yield out[ok]


def extract_documents(fetched: DataFrame, rules: DataFrame) -> DataFrame:
    """200-status rows → documents/images rows (decode + phash in Arrow).

    image_id = hex(xxhash64(url)) — content-addressed, so re-fetching the same
    URL merges idempotently (reference delete-then-index dedup, SURVEY T8).
    """
    ok = (
        fetched.filter((F.col("status_code") == 200) & F.col("_body").isNotNull())
        .join(F.broadcast(rules.select("rule_id", "rulename")), "rule_id")
        .withColumn("image_id", F.lower(F.hex(F.xxhash64("url"))))
        .withColumn("session_date", F.col("dates"))
    )
    cols = [
        "image_id", "_body", "_w", "_h", "_fmt", "_caption",
        "url_id", "url", "rulename", "session_date", "requested_at", "epoch",
    ]
    return ok.select(*cols).mapInPandas(_extract_batches, schema=DOCUMENTS)
