"""Frontier-drain throughput job for the N→4N scaling-efficiency evidence.

The reference seed list has ONE politeness domain, so its crawl rate is
budget-bound (0.33 req/s) and cannot show compute scaling. The north_rule's
10^10-URL frontier is multi-host; this job reproduces that regime
synthetically: H hosts × U URLs each, every host under the reference's
politeness budget (bucket cap 100/epoch), then measures URLs
**fetched + extracted per second** through the full pipeline:

  pending anti-join → two-stage salted priority drain → content-store fetch
  join → Arrow decode + phash extract → requests/documents merges

Run via spark-submit at two executor counts (tools/bench_scaling.py: 1 vs 4
concurrent processes over disjoint host shards, timed windows aligned by a
file barrier) on the SAME input; efficiency = (thpt_4N / thpt_N) / 4.

    spark-submit --master local[1] --py-files pkg.zip scale_bench.py \
        --hosts 30000 --host-shard 0 --host-shards 4 --warmup-budget 5
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd


def synthetic_multihost_web(spark, n_hosts: int, urls_per_host: int, img_px: int = 8):
    # img_px=8 by default: phash cost is resolution-independent (32×32 DCT),
    # so small payloads keep the CPU work while avoiding a disk-bound bench.
    """Content store across n_hosts politeness domains; bytes are raw-format
    Philox noise keyed by url id (generated once, reused by both runs)."""
    from pyspark.sql import functions as F

    from ..functions.urlkit import host_hash_expr, url_hash_expr
    from ..sources.schema import WEB

    n = n_hosts * urls_per_host
    # explicit fine-grained partitioning, INDEPENDENT of the generating run's
    # core count: the web dir is generated once and reused by every
    # parallelism level, so its file layout must give the widest leg enough
    # splits. 8 coarse files (a local[8] default) leave local[32] running one
    # ragged ~24-task wave with a long straggler tail — measured as the
    # "unstable 32-thread" artifact in round 1.
    n_parts = 128
    base = spark.range(0, n, 1, n_parts).select(
        F.concat(
            F.lit("https://host"),
            (F.col("id") % n_hosts).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.col("id").alias("doc_id"),
    )
    kind = (
        F.when(F.pmod(F.col("doc_id"), F.lit(11)) == 0, F.lit("missing"))
        .when(F.pmod(F.col("doc_id"), F.lit(13)) == 0, F.lit("flaky"))
        .otherwise(F.lit("ok"))
    )
    tagged = base.select(
        url_hash_expr("url").alias("url_hash"),
        "url",
        kind.alias("kind"),
        "doc_id",
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "url_hash": pdf["url_hash"], "url": pdf["url"], "kind": pdf["kind"],
                "bytes": [], "w": [], "h": [], "fmt": [], "caption": [],
                "final_url": pdf["url"],  # no redirect lane in the scale web
            }
            for did, kind_ in zip(pdf["doc_id"], pdf["kind"]):
                if kind_ == "missing":
                    for k in ("bytes", "w", "h", "fmt", "caption"):
                        out[k].append(None)
                    continue
                rng = np.random.Generator(np.random.Philox(key=int(did)))
                px = rng.integers(0, 256, size=(img_px, img_px, 3), dtype=np.uint8)
                out["bytes"].append(px.tobytes())
                out["w"].append(img_px)
                out["h"].append(img_px)
                out["fmt"].append("raw")
                out["caption"].append(f"doc {int(did)}")
            yield pd.DataFrame(out)

    return tagged.mapInPandas(gen, schema=WEB)


def multihost_frontier(spark, web):
    """Frontier over every web URL: deterministic priority per host."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.urlkit import host_hash_expr, salt_expr

    w = Window.partitionBy("host_hash").orderBy("url_hash")
    return (
        web.select("url", "url_hash")
        .withColumn("host_hash", host_hash_expr("url"))
        .withColumn("salt", salt_expr("url").cast("int"))
        .withColumn("url_id", F.xxhash64(F.lit(1), "url"))
        .withColumn("rule_id", F.lit(1))
        .withColumn("date_id", F.lit(0).cast("long"))
        .withColumn("dates", F.lit("2020-01-01").cast("date"))
        .withColumn("priority", F.row_number().over(w).cast("long"))
        .withColumn("created_epoch", F.lit(1))
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hosts", type=int, default=2000)
    p.add_argument("--urls-per-host", type=int, default=200)
    p.add_argument("--budget", type=int, default=100)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--img-px", type=int, default=8)
    p.add_argument("--no-warmup", action="store_true")
    # warm-up exists to pay JIT/codegen/Arrow-worker startup, not to move
    # data: cap its per-host budget so the untimed epoch stays short while
    # still exercising every stage of the pipeline
    p.add_argument("--warmup-budget", type=int, default=None)
    p.add_argument("--web", default=None, help="pre-generated web dir (reused across runs)")
    p.add_argument("--store", default=None)
    # executor-style sharding: this process crawls only hosts with
    # pmod(host_hash, host_shards) == host_shard — how a real multi-executor
    # cluster partitions a per-host-politeness frontier (tools/bench_scaling.py
    # launches K concurrent processes to evidence a K-executor cluster)
    p.add_argument("--host-shard", type=int, default=0)
    p.add_argument("--host-shards", type=int, default=1)
    # start barrier: with a dir given, every process finishes its warm-up,
    # drops ready-{shard}, and blocks until the harness writes "go" — so the
    # timed windows of concurrent executor-processes align exactly and the
    # harness's /proc/stat deltas attribute CPU to timed work only (JVM
    # startup, JIT, and warm-up excluded at every parallelism level alike)
    p.add_argument("--barrier-dir", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ..functions.rules import rules_df
    from ..plans.epoch import TERMINAL
    from ..plans.fetch import extract_documents, requests_log, simulate_requests
    from ..plans.frontier import priority_drain
    from ..sources.epochstore import EpochStore
    from ..sources import schema as S

    spark = (
        SparkSession.builder.appName("scale-bench")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    web_dir = args.web or tempfile.mkdtemp() + "/web"
    import os

    from ..functions.urlkit import host_hash_expr

    N_WEB_SHARDS = 16  # divisible by any executor count used here
    if not os.path.isdir(web_dir):
        # hive-partition the store by host shard: an executor-process
        # filtering on its shard then PRUNES at the directory level and
        # scans only its slice — modeling how a cluster distributes scan
        # tasks instead of every executor reading the whole table
        synthetic_multihost_web(
            spark, args.hosts, args.urls_per_host, args.img_px
        ).withColumn(
            "_shard", F.pmod(host_hash_expr("url"), F.lit(N_WEB_SHARDS))
        ).write.partitionBy("_shard").parquet(web_dir)
    web = spark.read.parquet(web_dir)
    if args.host_shards > 1:
        mine = [
            s for s in range(N_WEB_SHARDS) if s % args.host_shards == args.host_shard
        ]
        web = web.filter(F.col("_shard").isin(mine))
    web = web.drop("_shard")

    store = EpochStore(args.store or tempfile.mkdtemp() + "/store")
    frontier = multihost_frontier(spark, web)
    store.overwrite("frontier", frontier, 1, keys=["url_id"])
    frontier = store.read("frontier", spark)

    budgets = (
        frontier.select("host_hash").distinct()
        .withColumn("budget", F.lit(args.budget))
    )

    if not args.no_warmup:
        # untimed warm-up: run the full pipeline once against a throwaway
        # store so JIT / codegen / Arrow worker startup don't bill the first
        # timed epoch (the cross-level comparison needs equally-warm JVMs)
        warm_store = EpochStore(tempfile.mkdtemp() + "/warm")
        warm_budgets = budgets
        if args.warmup_budget:
            warm_budgets = budgets.withColumn(
                "budget", F.least("budget", F.lit(args.warmup_budget))
            )
        warm_pending = frontier
        warm_drained = priority_drain(warm_pending, warm_budgets)
        warm_fetched = simulate_requests(
            warm_drained, web, 1, datetime.now(timezone.utc)
        ).persist()
        warm_store.append("requests", requests_log(warm_fetched), 1)
        warm_store.merge(
            "documents", extract_documents(warm_fetched, web, rules_df(spark)), 1,
            keys=["image_id"],
        )
        warm_fetched.unpersist()

    if args.barrier_dir:
        bdir = os.path.abspath(args.barrier_dir)
        os.makedirs(bdir, exist_ok=True)
        with open(os.path.join(bdir, f"ready-{args.host_shard}"), "w") as f:
            f.write(str(os.getpid()))
        go = os.path.join(bdir, "go")
        while not os.path.exists(go):
            time.sleep(0.05)

    t0 = time.perf_counter()
    fetched_total = 0
    stage_secs: dict[str, float] = {}

    def mark(name: str, since: float) -> float:
        now = time.perf_counter()
        stage_secs[name] = round(stage_secs.get(name, 0.0) + (now - since), 2)
        return now

    for e in range(2, 2 + args.epochs):
        t = time.perf_counter()
        requests = store.read("requests", spark, schema=S.REQUESTS)
        terminal = requests.filter(F.col("status_code").isin(*TERMINAL)).select("url_id")
        pending = frontier.join(terminal, "url_id", "left_anti")
        drained = priority_drain(pending, budgets)
        fetched = simulate_requests(
            drained, web, e, datetime.now(timezone.utc)
        ).persist()
        n = fetched.count()  # materialize drain+fetch here to time it apart
        t = mark("drain_fetch", t)
        store.append("requests", requests_log(fetched), e)
        t = mark("requests_append", t)
        docs = extract_documents(fetched, web, rules_df(spark))
        store.merge("documents", docs, e, keys=["image_id"])
        t = mark("extract_merge", t)
        fetched_total += n
        fetched.unpersist()
    dt = time.perf_counter() - t0

    # UNTIMED politeness audit over the full request log this leg wrote:
    # no (epoch, host) group may exceed the budget table handed to
    # priority_drain — the log-side proof of the north_rule's "same
    # politeness budget" claim at bench scale (plans/politeness.py:
    # budget_table_audit). Recorded per trial row in BENCH/BASELINE.md.
    from ..plans.politeness import budget_table_audit

    violations = 0
    if args.epochs > 0:
        log = store.read("requests", spark, schema=S.REQUESTS)
        violations = budget_table_audit(log, budgets).count()

    print(
        json.dumps(
            {
                "cores": cores,
                "hosts": args.hosts,
                "urls_per_host": args.urls_per_host,
                "epochs": args.epochs,
                "urls_fetched": int(fetched_total),
                "wall_sec": round(dt, 3),
                "urls_per_sec": round(fetched_total / dt, 2),
                "politeness_violations": int(violations),
                "stages": stage_secs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
