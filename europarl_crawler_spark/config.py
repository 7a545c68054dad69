"""Engine configuration — the reference's settings.ini surface (S8).

The reference reads an INI file with DEFAULT-section inheritance
(reference: europarl/configuration.py:4-17) and spreads the knobs across
worker sections (settings.ini:6,16,19,30,33,55,63,78). Here the same knobs
are one dataclass, loadable from the same INI shape, consumed by
CrawlEngine / bench / jobs.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # politeness (reference settings.ini:30,33; workers/tokenbucket.py)
    min_interval_secs: float = 3.0
    throttling_factor: float = 10.0
    bucket_capacity: int = 100
    # scheduling (settings.ini:16; PrefetchLimit)
    prefetch_limit: int = 50
    # fetch (settings.ini:19,63; RequestTimeoutFactor × StopWaitSecs)
    request_timeout_secs: float = 7.5
    # epoch cadence — the batch analog of the reference's continuous loop
    epoch_secs: float = 300.0
    # session-day probe lag: only probe days older than today − offset
    # (reference get_unchecked_dates offset, db/sessionDay.py:36,104)
    probe_offset_days: int = 30
    # O8 spaced-refresh recrawl lane (reference downloader.py:39-68)
    recrawl_enabled: bool = True
    # physical knobs (ours): frontier salt shards, bloom target fpp
    n_salts: int = 16
    bloom_fpp: float = 0.01
    use_bloom: bool = True
    # seen-set pre-filter backend (north_rule "bloom/cuckoo URL-seen"):
    # "bloom"  — rebuilt from the frontier every epoch (O(frontier)/epoch,
    #            OR-merged per partition; insert-only)
    # "cuckoo" — built once, then maintained INCREMENTALLY: O(delta)/epoch
    #            adds, in-place deletes at shutdown_compact (D4) — the
    #            deletable sketch the reference's row-delete semantics map to
    # use_bloom=False disables the pre-filter entirely (exact anti-join only)
    seen_sketch: str = "bloom"
    cuckoo_shards: int = 16
    # drop the F.broadcast hints on the hot-path dimension joins (budgets,
    # ok-url keys, crawl metadata) when their estimated row count exceeds
    # this — AQE then picks the join strategy, so a 10^8-host deployment
    # degrades to thin-key shuffles instead of a forced multi-GB broadcast
    # (VERDICT r2 #1). ~4M rows × tens of bytes ≈ low hundreds of MB, the
    # upper edge of broadcast comfort on a 128 GiB executor.
    broadcast_threshold_rows: int = 4_000_000

    @classmethod
    def from_ini(cls, path: str) -> "EngineConfig":
        cp = configparser.ConfigParser()
        cp.read(path)

        def get(section: str, key: str, fallback):
            try:
                raw = cp.get(section, key)
            except (configparser.NoSectionError, configparser.NoOptionError):
                return fallback
            t = type(fallback)
            return t(raw) if t is not bool else raw.lower() in ("1", "true", "yes")

        return cls(
            min_interval_secs=get("TokenBucketWorker", "MinIntervalSecs", 3.0),
            throttling_factor=get("TokenBucketWorker", "ThrottlingFactor", 10.0),
            bucket_capacity=get("TokenBucketWorker", "BucketCapacity", 100),
            prefetch_limit=get("General", "PrefetchLimit", 50),
            request_timeout_secs=get("DocumentDownloader", "RequestTimeoutSecs", 7.5),
            epoch_secs=get("Engine", "EpochSecs", 300.0),
            probe_offset_days=get("SessionDayChecker", "ProbeOffsetDays", 30),
            recrawl_enabled=get("Engine", "RecrawlEnabled", True),
            n_salts=get("Engine", "Salts", 16),
            bloom_fpp=get("Engine", "BloomFpp", 0.01),
            use_bloom=get("Engine", "UseBloom", True),
            seen_sketch=get("Engine", "SeenSketch", "bloom"),
            cuckoo_shards=get("Engine", "CuckooShards", 16),
            broadcast_threshold_rows=get(
                "Engine", "BroadcastThresholdRows", 4_000_000
            ),
        )
