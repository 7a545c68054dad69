"""Pure-Python reference-semantics crawl simulator — the equivalence spec.

Implements, independently of any Spark code, the determinized crawl ordering
defined in SURVEY §7.4.1 from the reference's Instances=1 behavior
(the only regime where the reference itself is deterministic):

- unchecked-days batch: fresh days newest-first (limit−1 slots, reference
  db/sessionDay.py:76-77) ∪ retry days (probed, no terminal 200/404 outcome,
  db/sessionDay.py:82-96), final ORDER BY ASC LIMIT, consumed newest-first
  (workers/sessiondaychecker.py:83 ``list.pop``).
- doc-URL batch: confirmed-day (probe==200) × non-probe active rules minus
  already-generated combos, ORDER BY dates DESC LIMIT k (db/url.py:126-127),
  consumed OLDEST-first (workers/dateurlgenerator.py:111-113 ``list.pop``).
- drain: probes before docs within a host (the checker holds its own token
  stream in the reference); pending rows across epochs ordered by
  (lane priority, created_epoch); budget = TokenBucket epoch budget with the
  reference's throttle/unthrottle state machine fed by the epoch's distinct
  status codes.
- retry: any URL without a terminal (200/404) request stays eligible (T6).

The simulator consumes a *status oracle* (url, epoch) → status computed once
from the same simulated web the engine crawls — it replicates scheduling
semantics, not hash functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, timedelta

from europarl_crawler_spark.functions.rules import RULES, CrawlRule, build_url
from europarl_crawler_spark.plans.politeness import TokenBucket

TERMINAL = (200, 404)

# priority encodings — mirror plans/frontier.py's band scheme exactly:
# a pure function of (lane, dates, rule_id), NOT a batch rank, so rows from
# different epochs order identically in both implementations.
BAND = 10**12
_EPOCH0 = date(1970, 1, 1)


def probe_priority(d: date) -> int:
    return 0 * BAND + (10**7 - (d - _EPOCH0).days)


def doc_priority(d: date, rule_id: int) -> int:
    return 1 * BAND + (d - _EPOCH0).days * 1000 + rule_id


def recrawl_priority(d: date, rule_id: int) -> int:
    return 2 * BAND + (d - _EPOCH0).days * 1000 + rule_id


def spaced_refresh_keep(off: int) -> bool:
    """O8 schedule — mirrors plans/frontier.py spaced_refresh_keep_expr
    (reference downloader.py:39-68 spaced_out_dates, scaled)."""
    return off >= 0 and (
        off < 14
        or (off < 42 and off % 2 == 0)
        or (off < 322 and off % 5 == 0)
        or (off < 3132 and off % 10 == 0)
    )


@dataclass
class SimState:
    frontier: dict[tuple[int, str], dict] = field(default_factory=dict)  # (rule_id, url) → row
    requests: list[dict] = field(default_factory=list)
    bucket: TokenBucket = field(default_factory=TokenBucket)
    epoch: int = 0


def active_rules() -> list[tuple[int, CrawlRule]]:
    return [(i + 1, r) for i, r in enumerate(RULES) if r.active]


def run_epochs(
    days: list[date],
    status_of,  # (url, epoch) -> int status
    n_epochs: int,
    prefetch_limit: int = 50,
    epoch_secs: float = 600.0,
    start: datetime | None = None,
    offset_days: int = 30,
    recrawl: bool = True,
):
    """Returns (orders, frontier_keys): per-epoch ordered fetched-URL lists
    (the crawl order) and the final URL-seen set {(rule_id, url)}.

    ``start`` mirrors CrawlEngine.run(start=...): epoch e runs at simulated
    clock start + (e−1)·epoch_secs; its calendar date drives the probe-offset
    guard (reference db/sessionDay.py:104, today − offset) and the O8 recrawl
    lane's once-per-day staleness check (reference downloader.py:39-68)."""
    st = SimState()
    rules = active_rules()
    probe_rule_id, probe_rule = rules[0]
    assert probe_rule.name == "session_day"
    doc_rules = rules[1:]
    orders: list[list[str]] = []

    for _ in range(n_epochs):
        st.epoch += 1
        e = st.epoch
        now_date = (
            (start + timedelta(seconds=epoch_secs * (e - 1))).date()
            if start is not None
            else date.today()
        )
        cutoff = now_date - timedelta(days=offset_days)

        # --- probe lane (unchecked-days batch) -----------------------------
        probed_days = set()
        terminal_days = set()
        ok_days = set()
        for r in st.requests:
            if r["rule_id"] == probe_rule_id:
                probed_days.add(r["dates"])
                if r["status"] in TERMINAL:
                    terminal_days.add(r["dates"])
                if r["status"] == 200:
                    ok_days.add(r["dates"])
        fresh = sorted(
            (d for d in days if d not in probed_days and d <= cutoff), reverse=True
        )[: max(prefetch_limit - 1, 0)]
        retry = sorted(d for d in days if d in probed_days and d not in terminal_days)[
            :prefetch_limit
        ]
        batch = sorted(set(fresh) | set(retry))[:prefetch_limit]
        # consumed newest-first (encoded in probe_priority)
        for d in batch:
            url = build_url(probe_rule, d)
            key = (probe_rule_id, url)
            if key not in st.frontier:
                st.frontier[key] = {
                    "rule_id": probe_rule_id, "dates": d, "url": url,
                    "priority": probe_priority(d), "created_epoch": e,
                }

        # --- doc lane (todo combos) ---------------------------------------
        existing = {(rid, row["dates"]) for (rid, _), row in st.frontier.items()
                    for rid in [row["rule_id"]]}
        cand = [
            (d, rid, r)
            for d in ok_days
            for rid, r in doc_rules
            if (rid, d) not in existing
        ]
        batch_doc = sorted(cand, key=lambda t: (_neg(t[0]), t[1]))[:prefetch_limit]
        # consumed oldest-first within the batch (encoded in doc_priority)
        for d, rid, r in batch_doc:
            url = build_url(r, d)
            key = (rid, url)
            if key not in st.frontier:
                st.frontier[key] = {
                    "rule_id": rid, "dates": d, "url": url,
                    "priority": doc_priority(d, rid), "created_epoch": e,
                }

        # --- drain under politeness budget --------------------------------
        terminal_urls = {
            (r["rule_id"], r["url"]) for r in st.requests if r["status"] in TERMINAL
        }
        pending = [
            row for key, row in st.frontier.items() if key not in terminal_urls
        ]
        # O8 recrawl lane: terminal-200 doc URLs re-enter at recrawl priority
        # when their age hits the schedule and they weren't fetched today
        if recrawl:
            last_ok: dict[tuple[int, str], date] = {}
            for r in st.requests:
                if r["status"] == 200:
                    key = (r["rule_id"], r["url"])
                    if key not in last_ok or r["req_date"] > last_ok[key]:
                        last_ok[key] = r["req_date"]
            for key, row in st.frontier.items():
                if row["rule_id"] == probe_rule_id or key not in last_ok:
                    continue
                if not spaced_refresh_keep((now_date - row["dates"]).days):
                    continue
                if last_ok[key] >= now_date:
                    continue
                pending.append(
                    {**row, "priority": recrawl_priority(row["dates"], row["rule_id"])}
                )
        pending.sort(key=lambda r: (r["priority"], r["created_epoch"], r["url"]))
        budget = st.bucket.epoch_budget(epoch_secs)
        drained = pending[:budget]

        order = []
        codes = set()
        for row in drained:
            s = status_of(row["url"], e)
            st.requests.append(
                {"rule_id": row["rule_id"], "dates": row["dates"],
                 "url": row["url"], "status": s, "epoch": e,
                 "req_date": now_date}
            )
            order.append(row["url"])
            codes.add(s)
        orders.append(order)

        # politeness update (epoch boundary = throttling check, SURVEY T3) —
        # same clock progression as CrawlEngine: one check per epoch at
        # start + e*epoch_secs, so throttled intervals stop firing checks at
        # the same epoch in both implementations
        now = 1_000_000.0 + e * epoch_secs
        st.bucket.check_throttling(now, sorted(codes))
    return orders, set(st.frontier.keys())


def _neg(d: date):
    return (-d.year, -d.month, -d.day)
