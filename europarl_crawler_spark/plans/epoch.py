"""The crawl-epoch driver loop: snapshot-read → plan → drain → fetch → commit.

One epoch = one iteration of the reference's whole multiprocess runtime
(SURVEY §3.1): the queue/worker machinery (mptools) dissolves into batch
dataflow, the bounded queues into per-host politeness budgets (T1), the
DB lock bits into snapshot isolation (T7), and graceful-shutdown cleanup into
``shutdown_compact`` (D4).

Resumability: every table commit is an EpochStore manifest; `CrawlEngine`
restarts from the max committed epoch of the ``epochs`` ledger — any epoch is
re-runnable because merges are keyed (idempotent) and the requests log is
keyed by (url_id, epoch).

Determinism: with a fixed ``now`` per epoch, the whole crawl — frontier
membership, drain order, politeness state — is a pure function of
(seed days, web, budgets), which is what the ordering-equivalence tests
assert against the reference-semantics simulator.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import numpy as np

from ..functions.cuckoo import CuckooShardStore
from ..functions.rules import rules_df
from ..functions.seen import BloomShardStore, anti_join_seen
from ..sources import schema as S
from ..sources.epochstore import EpochStore
from .fetch import extract_documents, requests_log, simulate_requests
from .frontier import (
    priority_drain,
    recrawl_candidates,
    session_day_probes,
    todo_combos,
)
from .politeness import host_budgets, politeness_update, status_flags_agg
from .robots import apply_robots_gate

TERMINAL = (200, 404)

# fold url_state deltas into a base snapshot when this many commits stack up
URL_STATE_COMPACT_EVERY = 32


def _url_state_delta(fetched: DataFrame) -> DataFrame:
    """One epoch's fetch outcomes reduced to per-URL state-summary rows
    (the url_state table's append unit). Pure groupBy-max — combinable."""
    is_ok = F.col("status_code") == 200
    return fetched.groupBy("url_id").agg(
        F.max(F.col("status_code").isin(*TERMINAL)).alias("terminal"),
        F.max(is_ok).alias("has_ok"),
        F.max(F.when(is_ok, F.col("requested_at"))).alias("last_ok_at"),
        F.max(F.when(is_ok, F.col("epoch"))).cast("int").alias("last_ok_epoch"),
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: EpochStore,
        web: DataFrame,
        robots: DataFrame | None = None,
        prefetch_limit: int | None = None,
        epoch_secs: float | None = None,
        use_bloom: bool | None = None,
        config=None,
        crawl_delays: DataFrame | None = None,
    ):
        from ..config import EngineConfig

        cfg = config or EngineConfig()
        self.spark = spark
        self.store = store
        self.web = web
        self.robots = robots
        # robots Crawl-delay dimension (plans/robots.crawl_delays_df):
        # floors the per-host request interval in host_budgets
        self.crawl_delays = crawl_delays
        self.config = cfg
        self.prefetch_limit = prefetch_limit if prefetch_limit is not None else cfg.prefetch_limit
        self.epoch_secs = epoch_secs if epoch_secs is not None else cfg.epoch_secs
        self.use_bloom = use_bloom if use_bloom is not None else cfg.use_bloom
        self.rules = rules_df(spark)
        # incremental cuckoo seen-sketch (config seen_sketch="cuckoo"):
        # lives across epochs, rebuilt lazily after overflow/restart
        self._cuckoo = None

    # -- state ----------------------------------------------------------------

    def _politeness_df(self) -> DataFrame:
        """Per-host politeness state as a DataFrame — the data-plane form.
        No driver-side host dict: budgets and throttling transitions are
        joins/expressions (plans/politeness.py), so 10^7-10^8 hosts never
        round-trip through the driver."""
        return self._read("politeness", S.POLITENESS).drop("epoch")

    def _url_state(self) -> DataFrame:
        """Per-URL crawl-state summary: (terminal = ever 200/404, has_ok =
        ever 200, last_ok_at/epoch). The frontier's terminal anti-join,
        probe/confirm derivations, and the recrawl lane read THIS instead of
        re-aggregating the append-only requests log — per-epoch cost is
        O(urls fetched), bounded, instead of O(requests ever), unbounded.

        Stored as APPEND deltas (one summary row per fetched URL per epoch)
        and folded here with a map-side-combinable max aggregation — no
        window; ``_compact_url_state`` periodically folds the deltas into a
        base snapshot so read amplification stays bounded. Stores created by
        older engine versions bootstrap the table from the log once."""
        if (
            self.store.latest("url_state") is None
            and self.store.latest("requests") is not None
        ):
            requests = self._read("requests", S.REQUESTS)
            self.store.overwrite(
                "url_state",
                _url_state_delta(requests),
                (self.store.latest("requests") or 0),
            )
        raw = self._read("url_state", S.URL_STATE)
        return raw.groupBy("url_id").agg(
            F.max("terminal").alias("terminal"),
            F.max("has_ok").alias("has_ok"),
            F.max("last_ok_at").alias("last_ok_at"),
            F.max("last_ok_epoch").alias("last_ok_epoch"),
        )

    def _build_cuckoo(self, frontier: DataFrame):
        """Load-or-(re)build the incremental seen sketch (seen_sketch=
        "cuckoo"). A checkpoint stamped by ``save_sketch`` (with the
        frontier commit it reflects) is loaded instead of rebuilding when
        its stamp matches the CURRENT frontier head — at a 10^10-URL
        frontier the rebuild is a full-table scan, the load is a meta.json
        read. Any stamp mismatch (epochs committed since) falls back to
        the build; the sketch sizes at load 0.21 (~4.7× headroom) so
        per-epoch increments fit for many epochs between rebuilds.

        The sketch is a :class:`~europarl_crawler_spark.functions.cuckoo.
        CuckooShardStore`: shard tables live as files under the store
        root (executor-resident probes, driver peak = ONE shard —
        O(frontier/n_shards) per task, never the whole filter in any
        process; the r4 design broadcast the concatenated filter, ~25 GB
        at 10^10 URLs)."""
        loaded = self._load_sketch()
        if loaded is not None:
            return loaded
        return CuckooShardStore.build(
            frontier,
            self._sketch_dir() / "store",
            "url_id",
            n_shards=self.config.cuckoo_shards,
            load=0.21,
        )

    def _sketch_dir(self):
        return self.store.root / "_seen_sketch"

    def _load_sketch(self):
        e = self.store.latest("frontier")
        d = self._sketch_dir() / "store"
        if e is None or not (d / "meta.json").exists():
            return None
        st = CuckooShardStore(d)
        return st if st.stamp == e else None

    def save_sketch(self) -> None:
        """Stamp the shard store with the frontier commit it reflects —
        the shard files ARE the checkpoint (maintenance rewrites them
        atomically per shard); only a matching stamp is ever loadable."""
        e = self.store.latest("frontier")
        if self._cuckoo is None or e is None:
            return
        self._cuckoo.set_stamp(e)

    def bootstrap(self, days: DataFrame) -> None:
        """Initial load: seed-day domain (reference table bootstrap +
        rule-registry upsert, jobs/crawler.py:47-56). The calendar is
        written RANGE-CLUSTERED by ``dates`` so each file's footer bounds
        cover a tight date span — what makes the publication-lag cutoff
        read (run_epoch's ``dates <= now - offset`` predicate) prune at
        the manifest level instead of opening every calendar file."""
        if self.store.latest("session_days") is None:
            n_files = max(days.rdd.getNumPartitions(), 1)
            clustered = days.repartitionByRange(n_files, "dates")
            self.store.overwrite("session_days", clustered, 0, keys=["date_id"])

    def current_epoch(self) -> int:
        return self.store.latest("epochs") or 0

    def _estimated_hosts(self) -> int:
        """Host-count estimate from the politeness table's latest manifest
        (one row per seen host) — metadata only, no Spark job."""
        ms = self.store.manifests("politeness")
        return ms[-1]["rows"] if ms else 0

    def _read(self, table: str, schema) -> DataFrame:
        return self.store.read(table, self.spark, schema=schema).drop(
            "_epoch", "_deleted"
        )

    # -- one epoch -------------------------------------------------------------

    def run_epoch(self, now: datetime | None = None) -> dict:
        e = self.current_epoch() + 1
        now = now or datetime.now(timezone.utc)
        now_secs = now.timestamp()
        spark = self.spark

        days = self._read("session_days", S.SESSION_DAYS)
        frontier = self._read("frontier", S.FRONTIER)
        url_state = self._url_state()

        # 1. frontier growth: probe URLs for unchecked days (O3/J5/J6/T12) and
        #    doc URLs for confirmed days (J1/J2/J3/O1) — both already
        #    anti-joined against the frontier on their natural keys. All
        #    derivations read the O(urls) url_state summary, never the
        #    unbounded request log.
        # fresh-probe calendar read with the publication-lag cutoff pushed
        # to the store: files whose date range is wholly inside the lag
        # window are pruned at the manifest level (EpochStore.read
        # predicates; store.last_prune records kept/total — surfaced in
        # this epoch's stats). Retry keeps the full calendar (see
        # session_day_probes docstring).
        cutoff = now.date() - timedelta(days=self.config.probe_offset_days)
        days_fresh = self.store.read(
            "session_days",
            spark,
            schema=S.SESSION_DAYS,
            predicates=[("dates", None, cutoff)],
        ).drop("_epoch", "_deleted")
        days_prune = dict(getattr(self.store, "last_prune", {}) or {})
        probes = session_day_probes(
            spark, days, url_state, frontier, self.prefetch_limit, e,
            now_date=now.date(), offset_days=self.config.probe_offset_days,
            fresh_source=days_fresh,
        )
        combos = todo_combos(
            spark, days, url_state, frontier, self.prefetch_limit, e
        )
        new_urls = probes.unionByName(combos)

        # 2. URL-seen gate on the hashed key: exact anti-join, bloom
        #    pre-filtered (north_rule). Seen key = url_id (= rule_id × url,
        #    the reference's UNIQUE constraint, db/url.py:45).
        sketch = None
        mode = self.config.seen_sketch if self.use_bloom else "none"
        if mode == "cuckoo":
            if self._cuckoo is None:
                # restart path: the shutdown checkpoint's stamp can only
                # match BEFORE this epoch's merge advances the chain head
                self._cuckoo = self._load_sketch()
            sketch = self._cuckoo
        elif mode == "bloom" and self.store.latest("frontier") is not None:
            expected = sum(m["rows"] for m in self.store.manifests("frontier")) or 1
            # executor-resident shard store (r5): the per-epoch rebuild is
            # unchanged, but the bitsets live as files and probes load only
            # their shard — no whole-filter broadcast (see BloomShardStore)
            sketch = BloomShardStore.build(
                frontier,
                self._sketch_dir() / "bloom",
                "url_id",
                expected=expected,
                n_shards=self.config.cuckoo_shards,
            )
        fresh = anti_join_seen(new_urls, frontier, sketch, hash_col="url_id")
        if self._cuckoo is not None:
            fresh = fresh.persist()
        # the frontier keeps its OWN commit chain (like documents/url_state):
        # shutdown_compact's delete+compact commits advance it past the
        # crawl clock, and a resumed crawl must commit above BOTH
        f_e = max(e, (self.store.latest("frontier") or 0) + 1)
        m = self.store.merge("frontier", fresh, f_e, keys=["url_id"])
        if self._cuckoo is not None:
            # incremental sketch maintenance: only THIS epoch's genuinely-new
            # url_ids (post exact anti-join) cross to the driver — O(delta),
            # bounded by the prefetch limits, vs the bloom path's O(frontier)
            # rebuild per epoch. Overflow (headroom exhausted) drops the
            # sketch; it is rebuilt below from the merged frontier.
            ids = np.unique(
                np.fromiter(
                    (r.url_id for r in fresh.select("url_id").collect()),
                    dtype=np.int64,
                )
            )
            try:
                self._cuckoo.add_many(ids)
            except RuntimeError:
                self._cuckoo = None
            fresh.unpersist()
        frontier = self._read("frontier", S.FRONTIER)
        if (
            mode == "cuckoo"
            and self._cuckoo is None
            and self.store.latest("frontier") is not None
        ):
            # covers first build (epoch 1), rebuild-after-overflow, AND
            # restart into a steady-state epoch that merged zero new urls
            self._cuckoo = self._build_cuckoo(frontier)

        # 3. pending = frontier rows without a terminal outcome — covers both
        #    never-fetched and dead-letter retries (T6: 408/460/429/5xx stay
        #    eligible) — plus the O8 recrawl lane: terminal-200 docs whose age
        #    hits the spaced-refresh schedule re-enter at recrawl priority
        #    (after all fresh work; reference downloader.py:39-68).
        terminal = url_state.filter(F.col("terminal")).select("url_id")
        pending = frontier.join(terminal, "url_id", "left_anti")
        if self.config.recrawl_enabled:
            pending = pending.unionByName(
                recrawl_candidates(frontier, url_state, now.date())
            )
        if self.robots is not None:
            pending = apply_robots_gate(pending, self.robots)

        # 4. politeness budgets per host — a join against the state table
        #    (data-plane; no host collect, see plans/politeness.py).
        politeness = self._politeness_df()
        budgets = host_budgets(
            pending.select("host_hash").distinct(),
            politeness,
            self.epoch_secs,
            self.config.min_interval_secs,
            crawl_delays=self.crawl_delays,
        )
        # broadcast hints are config-gated (VERDICT r2 #1): the host-count
        # estimate comes from the politeness table's manifest row count —
        # no counting job. Above the threshold the hints drop and AQE picks
        # the join strategy (thin-key shuffles at the 10^8-host regime).
        est_hosts = self._estimated_hosts()
        thr = self.config.broadcast_threshold_rows
        drained = priority_drain(pending, budgets, hint_broadcast=est_hosts <= thr)

        # 5. fetch + extract (the epoch's big join + the Arrow decode pass).
        fetched = simulate_requests(drained, self.web, e, now).persist()
        self.store.append("requests", requests_log(fetched), e)
        # url_state delta: this epoch's outcomes summarized per URL; folded
        # at read, compacted every K commits so reads stay O(urls)+O(K deltas).
        # The table keeps its OWN monotonic commit chain (compactions insert
        # extra commits between crawl epochs).
        se = (self.store.latest("url_state") or 0) + 1
        self.store.append("url_state", _url_state_delta(fetched), se)
        if len(self.store.manifests("url_state")) % URL_STATE_COMPACT_EVERY == 0:
            self.store.overwrite("url_state", self._url_state(), se + 1)
        docs = extract_documents(
            fetched, self.web, self.rules,
            hint_broadcast=est_hosts * self.config.bucket_capacity <= thr,
        )
        # documents has its own commit chain: reset/reextract (D9) may have
        # advanced it past the crawl clock — never commit at-or-below it
        doc_e = max(e, (self.store.latest("documents") or 0) + 1)
        self.store.merge("documents", docs, doc_e, keys=["image_id"])

        # 6. politeness update from the epoch status flags (A1) — one
        #    full-outer join + expressions, state never leaves the executors.
        pol = politeness_update(
            politeness,
            status_flags_agg(fetched),
            now_secs + self.epoch_secs,
            self.config.min_interval_secs,
        ).withColumn("epoch", F.lit(e))
        self.store.overwrite("politeness", pol, e, keys=["host_hash"])

        # per-partition lineage + fetch metrics (north_rule): counts per
        # (host, salt, status) for this epoch.
        metrics = (
            fetched.groupBy("host_hash", "salt", "status_code")
            .agg(F.count("*").alias("n"))
            .withColumn("epoch", F.lit(e))
        )
        self.store.append("metrics", metrics, e)

        agg = fetched.agg(
            F.count("*").alias("drained"),
            F.sum((F.col("status_code") == 200).cast("long")).alias("ok"),
            F.sum((~F.col("status_code").isin(200, 404)).cast("long")).alias("dead"),
        ).first()
        stats = {
            "epoch": e,
            "new_urls": m["rows"],
            "drained": agg["drained"] or 0,
            "fetched_ok": agg["ok"] or 0,
            "dead_letter": agg["dead"] or 0,
            # manifest-pruning counter of the cutoff calendar read
            "days_files_kept": days_prune.get("kept"),
            "days_files_total": days_prune.get("total"),
        }
        ledger = spark.createDataFrame(
            [
                (
                    e,
                    now,
                    stats["new_urls"],
                    stats["drained"],
                    stats["fetched_ok"],
                    stats["dead_letter"],
                )
            ],
            "epoch int, started timestamp, new_urls long, drained long, fetched_ok long, dead_letter long",
        )
        self.store.append("epochs", ledger, e)
        fetched.unpersist()
        return stats

    def run(self, n_epochs: int, start: datetime | None = None) -> list[dict]:
        """Run n epochs with a deterministic simulated clock when ``start`` is
        given (each epoch advances by epoch_secs)."""
        out = []
        for i in range(n_epochs):
            now = None
            if start is not None:
                from datetime import timedelta

                now = start + timedelta(seconds=self.epoch_secs * (self.current_epoch()))
            out.append(self.run_epoch(now))
        return out

    # -- reprocessing ----------------------------------------------------------

    def reextract(self) -> dict:
        """Re-run the extraction stage for every successfully-fetched URL —
        the postprocessing re-run after ``reset_postprocessing`` (D9).

        Reference: the postprocessing worker re-enqueues every document whose
        ``data IS NULL`` (workers/postprocessingworker.py:37-65 over
        db/documents.py get_unprocessed); here the request log + content
        store are sufficient to rebuild the documents table, and the
        image_id merge key makes the rebuild idempotent. The latest-success
        pick is a map-side-combinable max(struct) — no window."""
        # commit above BOTH the crawl clock and the documents table's own
        # chain (a reset writes tombstones at documents-latest + 1, which may
        # already exceed the crawl epoch — colliding would clobber them)
        e = max(self.current_epoch(), self.store.latest("documents") or 0) + 1
        frontier = self._read("frontier", S.FRONTIER)
        requests = self._read("requests", S.REQUESTS)
        latest = (
            requests.filter(F.col("status_code") == 200)
            .groupBy("url_id")
            .agg(F.max(F.struct("requested_at", "epoch")).alias("_s"))
            .select(
                "url_id",
                F.col("_s.requested_at").alias("requested_at"),
                F.col("_s.epoch").alias("epoch"),
            )
        )
        fetched_like = frontier.join(latest, "url_id").withColumn(
            "status_code", F.lit(200)
        )
        # reextract touches every URL ever fetched OK — gate the metadata/key
        # broadcasts on the frontier's manifest row-count upper bound
        est_urls = sum(m["rows"] for m in self.store.manifests("frontier"))
        docs = extract_documents(
            fetched_like, self.web, self.rules,
            hint_broadcast=est_urls <= self.config.broadcast_threshold_rows,
        )
        m = self.store.merge("documents", docs, e, keys=["image_id"])
        return {"epoch": e, "reextracted": m["rows"]}

    # -- shutdown --------------------------------------------------------------

    def shutdown_compact(self) -> None:
        """D4: drop frontier rows that were never requested (reference
        drop_uncrawled_urls at crawler shutdown, db/url.py:139-156), then
        compact the frontier so the next run reads one base snapshot."""
        # commit above both the crawl clock and the frontier's own chain
        # (repeated shutdowns / post-shutdown crawls advance the latter)
        e = max(self.current_epoch(), self.store.latest("frontier") or 0) + 1
        frontier = self._read("frontier", S.FRONTIER)
        fetched_ids = self._url_state().select("url_id")
        uncrawled = frontier.join(fetched_ids, "url_id", "left_anti")
        if self._cuckoo is not None:
            # the deletable-sketch payoff (reference deletes seen rows,
            # db/url.py:139-156): evict the dropped urls from the cuckoo
            # in place instead of rebuilding. Collected BEFORE the delete/
            # compact rewrite the underlying files. A huge drop set would
            # make rebuild cheaper than delete — past the broadcast
            # threshold just discard the sketch; the next epoch rebuilds.
            ids = np.fromiter(
                (r.url_id for r in uncrawled.select("url_id").collect()),
                dtype=np.int64,
            )
            if len(ids) <= self.config.broadcast_threshold_rows:
                self._cuckoo.delete_many(np.unique(ids))
            else:
                self._cuckoo = None
        self.store.delete("frontier", uncrawled, e, keys=["url_id"])
        self.store.compact("frontier", self.spark, e + 1)
        # post-eviction sketch == compacted frontier: checkpoint it stamped
        # with the compaction commit so the next run loads instead of
        # rescanning the frontier
        self.save_sketch()
