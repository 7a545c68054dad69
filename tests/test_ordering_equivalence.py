"""Crawl-ordering + URL-seen equivalence: CrawlEngine vs the pure-Python
reference-semantics simulator (tests/refsim.py) on the same seed list, web,
and politeness budget — the north_rule's parity claim.

The simulator shares NO Spark code path with the engine (only the golden URL
builder, itself verified against the reference's 22 exact strings, and the
TokenBucket class, verified against the reference's truth tables); agreement
therefore checks the engine against an independent executable spec of the
determinized reference order (SURVEY §7.4.1)."""

from __future__ import annotations

from datetime import date, datetime, timezone

import pytest

from pyspark.sql import functions as F

from europarl_crawler_spark.plans.epoch import CrawlEngine
from europarl_crawler_spark.sources.epochstore import EpochStore
from europarl_crawler_spark.sources.synthetic import (
    session_days_df,
    simulated_web,
    status_expr,
)

import refsim

N_DAYS = 18
N_EPOCHS = 4
EPOCH_SECS = 600.0
START = datetime(2021, 6, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ordereq")
    days_df = session_days_df(spark, start=date(2019, 8, 1), n_days=N_DAYS)
    web = simulated_web(spark, days_df)
    web.write.parquet(str(root / "web"))
    web = spark.read.parquet(str(root / "web"))

    # status oracle: (url, epoch) → status, computed once from the same web
    oracle: dict[tuple[str, int], int] = {}
    for e in range(1, N_EPOCHS + 1):
        rows = web.select(
            "url", status_expr(F.col("kind"), F.col("url_hash"), e).alias("s")
        ).collect()
        for r in rows:
            oracle[(r.url, e)] = r.s

    def status_of(url: str, epoch: int) -> int:
        return oracle.get((url, epoch), 404)

    store = EpochStore(root / "store")
    eng = CrawlEngine(
        spark, store, web, prefetch_limit=50, epoch_secs=EPOCH_SECS
    )
    eng.bootstrap(days_df)
    eng.run(N_EPOCHS, start=START)

    days = [r.dates for r in days_df.collect()]
    sim_orders, sim_frontier = refsim.run_epochs(
        days, status_of, N_EPOCHS, prefetch_limit=50, epoch_secs=EPOCH_SECS
    )
    return dict(
        spark=spark, store=store, sim_orders=sim_orders,
        sim_frontier=sim_frontier, days=days,
    )


def _engine_orders(world):
    spark = world["spark"]
    store = world["store"]
    req = store.read("requests", spark)
    frontier = store.read("frontier", spark)
    joined = (
        req.join(frontier.select("url_id", "url"), "url_id")
        .select("epoch", "drain_seq", "url")
        .collect()
    )
    orders: dict[int, list[tuple[int, str]]] = {}
    for r in joined:
        orders.setdefault(r.epoch, []).append((r.drain_seq, r.url))
    return {
        e: [u for _, u in sorted(v)] for e, v in orders.items()
    }


def test_crawl_order_matches_simulator(world):
    eng_orders = _engine_orders(world)
    for e in range(1, N_EPOCHS + 1):
        assert eng_orders.get(e, []) == world["sim_orders"][e - 1], f"epoch {e}"


def test_url_seen_set_matches_simulator(world):
    """URL-seen membership equality (north_rule): the engine's frontier key
    set {(rule_id, url)} equals the simulator's exactly."""
    spark = world["spark"]
    frontier = world["store"].read("frontier", spark)
    eng_urls = {(r.rule_id, r.url) for r in frontier.select("rule_id", "url").collect()}
    assert eng_urls == world["sim_frontier"]
