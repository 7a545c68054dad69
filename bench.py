#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS], plus a mini crawl-epoch run measuring
frontier-drain throughput (the BASELINE.json target metric).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls_fetched": n, "urls_per_sec": r, "epochs": k}}

Scaling evidence (N vs 4N cores) is produced by tools/bench_scaling.py which
invokes this file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "j8_metadata_join",
    "f2_url_build",
    "j2_anti_seen",
    "o1_o2_topk_drain",
    "o8_spaced_refresh",
    "t1_events_hourly",
    "w1_top_customer_per_nation",
    "a1_status_histogram",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality",
    "text_language_id",
    "text_token_count",
    "text_profile",
    "text_fingerprint",
    "multimodal_binary_meta",
    "multimodal_png_codec",
]

CRAWL_DAYS = int(os.environ.get("SPARK_GRAFT_CRAWL_DAYS", "60"))
CRAWL_EPOCHS = int(os.environ.get("SPARK_GRAFT_CRAWL_EPOCHS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from europarl_crawler_spark import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        # count() forces full execution without shipping wide rows to driver
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    # crawl-epoch throughput: the BASELINE.json metric (URLs fetched+extracted
    # per second through the full frontier→drain→fetch→merge→commit path)
    from datetime import date, datetime, timezone

    from europarl_crawler_spark.plans.epoch import CrawlEngine
    from europarl_crawler_spark.sources.epochstore import EpochStore
    from europarl_crawler_spark.sources.synthetic import session_days_df, simulated_web

    crawl = {}
    with tempfile.TemporaryDirectory() as root:
        days = session_days_df(spark, start=date(2019, 7, 2), n_days=CRAWL_DAYS)
        simulated_web(spark, days).write.parquet(root + "/web")
        web = spark.read.parquet(root + "/web")
        eng = CrawlEngine(
            spark, EpochStore(root + "/store"), web,
            prefetch_limit=100, epoch_secs=3000.0,
        )
        eng.bootstrap(days)
        t0 = time.perf_counter()
        stats = eng.run(CRAWL_EPOCHS, start=datetime(2021, 1, 1, tzinfo=timezone.utc))
        dt = time.perf_counter() - t0
        fetched = sum(s["drained"] for s in stats)
        crawl = {
            "epochs": CRAWL_EPOCHS,
            "urls_fetched": int(fetched),
            "crawl_sec": round(dt, 3),
            "urls_per_sec": round(fetched / dt, 3) if dt > 0 else 0.0,
        }
        total += dt
    timings["crawl_epochs"] = crawl["crawl_sec"]

    print(
        json.dumps(
            {
                "metric": "headline queries + crawl epochs wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
