"""End-to-end crawl epochs over the simulated web.

Asserts the load-bearing semantics: frontier growth + dedup, probe→confirm→
doc-URL progression, politeness budget enforcement, dead-letter retry
draining, per-row image invariants (decode allclose / PSNR ≥ 40 dB + exact
caption equality — input_hint), and checkpoint resume.
"""

from __future__ import annotations

from datetime import date, datetime, timezone

import numpy as np
import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.functions import imaging
from europarl_crawler_spark.plans.epoch import CrawlEngine
from europarl_crawler_spark.sources.epochstore import EpochStore
from europarl_crawler_spark.sources.synthetic import session_days_df, simulated_web

START = datetime(2021, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    days = session_days_df(spark, start=date(2019, 7, 2), n_days=20)
    web = simulated_web(spark, days)
    web.write.mode("overwrite").parquet(str(root / "web"))
    web = spark.read.parquet(str(root / "web"))
    store = EpochStore(root / "store")
    eng = CrawlEngine(spark, store, web, prefetch_limit=50, epoch_secs=600.0)
    eng.bootstrap(days)
    stats = eng.run(4, start=START)
    return dict(root=root, days=days, web=web, store=store, eng=eng, stats=stats)


def test_epochs_progress(world):
    stats = world["stats"]
    assert [s["epoch"] for s in stats] == [1, 2, 3, 4]
    # epoch 1 drains only session-day probes; confirmed days then unlock doc
    # URLs in epoch 2+
    assert stats[0]["drained"] > 0
    assert stats[1]["new_urls"] > 0
    assert sum(s["fetched_ok"] for s in stats) > 0


def test_frontier_unique_and_seen(world):
    spark = world["eng"].spark
    frontier = world["store"].read("frontier", spark)
    n = frontier.count()
    assert n == frontier.select("url_id").distinct().count()
    # reference quirk preserved: named_voting_fr_pdf and _xml generate the
    # SAME url string but remain separate frontier rows (UNIQUE(rule_id,url),
    # reference db/url.py:45)
    assert n >= frontier.select("url_hash").distinct().count()


def test_politeness_budget_enforced(world):
    spark = world["eng"].spark
    requests = world["store"].read("requests", spark)
    per_epoch_host = (
        requests.groupBy("epoch", "host_hash").count().collect()
    )
    # budget = epoch_secs/interval capped at bucket capacity 100
    for r in per_epoch_host:
        assert r["count"] <= 100


def test_dead_letter_retry_lane(world):
    spark = world["eng"].spark
    requests = world["store"].read("requests", spark)
    dead = requests.filter(~F.col("status_code").isin(200, 404))
    if dead.count() == 0:
        pytest.skip("no flaky URL drained in this window")
    # a dead-lettered url must be retried in a later epoch (T6/J6)
    retried = (
        requests.alias("a")
        .join(requests.alias("b"), "url_id")
        .filter(
            (~F.col("a.status_code").isin(200, 404))
            & (F.col("b.epoch") > F.col("a.epoch"))
        )
    )
    assert retried.count() > 0


def test_image_invariants_vs_web(world):
    """input_hint per-row invariant: decoded pixels allclose (exact for
    lossless, PSNR ≥ 40 dB for qraw) + EXACT caption equality vs the origin."""
    spark = world["eng"].spark
    docs = world["store"].read("documents", spark)
    joined = (
        docs.alias("d")
        # documents serve the post-redirect URL (reference db/documents.py:213)
        .join(
            world["web"].alias("w"),
            F.col("d.url") == F.coalesce(F.col("w.final_url"), F.col("w.url")),
        )
        .select(
            "d.bytes", "d.w", "d.h", "d.fmt", "d.caption", "d.phash",
            F.col("w.bytes").alias("src_bytes"), F.col("w.caption").alias("src_caption"),
        )
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        assert r.caption == r.src_caption
        got = imaging.decode(bytes(r.bytes), r.w, r.h, r.fmt)
        src = imaging.decode(bytes(r.src_bytes), r.w, r.h, r.fmt)
        if r.fmt in imaging.LOSSLESS:
            assert np.array_equal(got, src)
        else:
            assert imaging.psnr(got, src) >= 40.0
        assert r.phash == imaging.phash64(got)


def test_png_lane_flows_end_to_end(world):
    """The compressed-PNG lane (half the .html rule slice) must land real
    png documents whose decoded pixels equal the origin's exactly — the
    invariant test above covers it generically; this pins that the lane is
    actually exercised (a silent fmt-mapping regression would otherwise
    vacuously pass it)."""
    spark = world["eng"].spark
    docs = world["store"].read("documents", spark)
    png = docs.filter(F.col("fmt") == "png")
    assert png.count() > 0, "no png documents crawled — lane not exercised"
    r = png.first()
    px = imaging.decode(bytes(r.bytes), r.w, r.h, "png")
    assert px.shape == (r.h, r.w, 3)
    assert r.phash == imaging.phash64(px)
    # the payload is genuinely compressed PNG, not renamed raw
    assert bytes(r.bytes)[:8] == b"\x89PNG\r\n\x1a\n"


def test_jpeg_lane_flows_end_to_end(world):
    """The baseline-JPEG lane (a quarter of the .html rule slice) must land
    real JFIF documents: genuine DCT-compressed payloads whose decode passes
    the lossy PSNR ≥ 40 dB invariant — the web's dominant image format
    crawled for real, not stubbed."""
    spark = world["eng"].spark
    docs = world["store"].read("documents", spark)
    jp = docs.filter(F.col("fmt") == "jpeg")
    if jp.count() == 0:
        pytest.skip("no jpeg URL drained in this window")
    r = jp.first()
    body = bytes(r.bytes)
    assert body[:2] == b"\xff\xd8" and b"JFIF\x00" in body[:32]
    px = imaging.decode(body, r.w, r.h, "jpeg")
    assert px.shape == (r.h, r.w, 3)
    assert r.phash == imaging.phash64(px)


def test_redirect_lane(world):
    """Reference contract (documentdownloader.py:97,124 + db/requests.py:39):
    redirects are followed; the request log records the FINAL url; documents
    serve the final url; the URL-seen set stays keyed on the requested url."""
    spark = world["eng"].spark
    web = world["web"]
    requests = world["store"].read("requests", spark)
    logged = requests.join(
        web.select("url_hash", "url", "kind", "final_url"), "url_hash"
    )
    redirected = logged.filter(
        (F.col("kind") == "redirect") & (F.col("status_code") == 200)
    )
    if redirected.count() == 0:
        pytest.skip("no redirect URL drained in this window")
    for r in redirected.select("url", "final_url", "redirected_url").collect():
        assert r.redirected_url == r.final_url == r.url + "?location=archive"
    # non-redirect fetches log their own url (reference resp.url == url)
    plain = logged.filter(F.col("kind") != "redirect")
    assert plain.filter(F.col("redirected_url") != F.col("url")).count() == 0
    # documents for redirect rows carry the final url, with the content id
    # still derived from the REQUESTED url (idempotent re-merge key)
    docs = world["store"].read("documents", spark)
    d = docs.filter(F.col("url").endswith("?location=archive"))
    assert d.count() > 0
    bad_key = d.filter(
        F.lower(
            F.hex(F.xxhash64(F.regexp_replace("url", r"\?location=archive$", "")))
        )
        != F.col("image_id")
    )
    assert bad_key.count() == 0
    # frontier (the seen set) never contains a final_url-form entry
    frontier = world["store"].read("frontier", spark)
    assert frontier.filter(F.col("url").endswith("?location=archive")).count() == 0


def test_documents_idempotent_merge(world):
    spark = world["eng"].spark
    docs = world["store"].read("documents", spark)
    assert docs.count() == docs.select("image_id").distinct().count()


def test_resume_from_checkpoint(world):
    """A new engine instance picks up at the committed epoch and continues."""
    spark = world["eng"].spark
    store = world["store"]
    before = store.read("requests", spark).count()
    eng2 = CrawlEngine(spark, store, world["web"], prefetch_limit=50, epoch_secs=600.0)
    assert eng2.current_epoch() == 4
    s = eng2.run(1, start=START)
    assert s[0]["epoch"] == 5
    assert store.read("requests", spark).count() >= before


def test_metrics_lineage_written(world):
    spark = world["eng"].spark
    metrics = store = world["store"].read("metrics", spark)
    assert {"host_hash", "salt", "status_code", "n", "epoch"} <= set(metrics.columns)
    assert metrics.count() > 0


def test_shutdown_drops_uncrawled(world):
    spark = world["eng"].spark
    store = world["store"]
    eng = world["eng"]
    frontier_before = store.read("frontier", spark)
    requests = store.read("requests", spark)
    uncrawled = frontier_before.join(requests.select("url_id"), "url_id", "left_anti").count()
    eng.shutdown_compact()
    frontier_after = store.read("frontier", spark)
    assert frontier_after.count() == frontier_before.count() - uncrawled
    assert (
        frontier_after.join(requests.select("url_id"), "url_id", "left_anti").count()
        == 0
    )


def test_politeness_gap_audit_detects_and_clears(spark):
    """politeness_audit (P12): violations are exactly the same-host gaps
    below the interval; a properly spaced log audits clean."""
    from europarl_crawler_spark.plans.politeness import politeness_audit
    rows = [
        # host 1: 0s, 2s (violation @3s min), 10s (ok)
        (1, 101, datetime(2021, 1, 1, 0, 0, 0)),
        (1, 102, datetime(2021, 1, 1, 0, 0, 2)),
        (1, 103, datetime(2021, 1, 1, 0, 0, 10)),
        # host 2: exactly 3s apart — not a violation (gap == interval)
        (2, 201, datetime(2021, 1, 1, 0, 0, 0)),
        (2, 202, datetime(2021, 1, 1, 0, 0, 3)),
        # host 3: simultaneous pair — gap 0 violates, tie broken by id
        (3, 301, datetime(2021, 1, 1, 0, 0, 0)),
        (3, 302, datetime(2021, 1, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "host_key INT, request_id INT, requested_at TIMESTAMP"
    )
    got = {
        (r["host_key"], r["request_id"], r["prev_request_id"], r["gap_us"])
        for r in politeness_audit(df, 3.0).collect()
    }
    assert got == {(1, 102, 101, 2_000_000), (3, 302, 301, 0)}


def test_budget_audit_engine_log_clean(world):
    """budget_audit: the ENGINE's own request log never exceeds the
    politeness budget that governed each epoch (state snapshot as of the
    previous epoch, via the store's time travel) — and a doctored log with
    one duplicated host-epoch batch trips the audit."""
    from functools import reduce

    from europarl_crawler_spark.plans.politeness import budget_audit

    spark = world["eng"].spark
    store = world["store"]
    requests = world["store"].read("requests", spark)
    snaps = []
    for e in range(1, 5):
        snap = store.read("politeness", spark, as_of=e)
        snaps.append(
            snap.select("host_hash", "interval_secs").withColumn(
                "epoch", F.lit(e).cast("long")
            )
        )
    hist = reduce(lambda a, b: a.unionByName(b), snaps)
    viol = budget_audit(requests, hist, epoch_secs=600.0)
    assert viol.count() == 0
    # negative control: double one epoch's busiest host → budget exceeded
    one = requests.limit(1).select("epoch", "host_hash").collect()[0]
    extra = (
        requests.filter(
            (F.col("epoch") == one["epoch"])
            & (F.col("host_hash") == one["host_hash"])
        )
        # re-id the duplicates so they read as additional requests
        .withColumn("request_id", F.col("request_id") + F.lit(10**15))
    )
    doctored = requests.unionByName(extra)
    for _ in range(7):  # 2^7 × actual ≥ any in-force budget (capacity 100)
        doctored = doctored.unionByName(
            doctored.filter(
                (F.col("epoch") == one["epoch"])
                & (F.col("host_hash") == one["host_hash"])
            ).withColumn("request_id", F.col("request_id") + F.lit(10**14))
        )
    assert budget_audit(doctored, hist, epoch_secs=600.0).count() > 0


def test_calendar_cutoff_read_prunes_files(spark, tmp_path):
    """r4 VERDICT next-round #8: the publication-lag cutoff is pushed into
    the ordinary store read — with a calendar straddling the cutoff, the
    crawl epoch's pruned read must skip the files wholly inside the lag
    window (kept < total in the manifest-pruning counter) while the probe
    batch itself stays identical to the unpruned derivation (the filter is
    still applied; pruning is only file skipping)."""
    from datetime import date, datetime, timedelta, timezone

    from europarl_crawler_spark.plans.epoch import CrawlEngine
    from europarl_crawler_spark.sources.epochstore import EpochStore
    from europarl_crawler_spark.sources.synthetic import (
        session_days_df,
        simulated_web,
    )

    now = datetime(2021, 1, 1, tzinfo=timezone.utc)
    # 60 days ending AT now: the newest ~30 are inside the default
    # publication-lag window, so with range-clustered calendar files a
    # whole tail of files is prunable
    days = session_days_df(
        spark, start=now.date() - timedelta(days=59), n_days=60
    )
    web = simulated_web(spark, days)
    store = EpochStore(tmp_path / "store")
    eng = CrawlEngine(spark, store, web, epoch_secs=600.0)
    eng.bootstrap(days)
    stats = eng.run_epoch(now=now)
    kept, total = stats["days_files_kept"], stats["days_files_total"]
    assert kept is not None and total is not None
    assert 0 < kept < total, (kept, total)
    # and the probes the epoch generated respect the cutoff exactly
    frontier = store.read("frontier", spark)
    cutoff = now.date() - timedelta(days=30)
    probed = [r.dates for r in frontier.select("dates").collect()]
    assert probed and all(d <= cutoff for d in probed)
