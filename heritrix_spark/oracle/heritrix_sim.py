"""heritrix_sim — pure-Python crawl-ordering oracle (the golden model).

Implements, exactly, the superstep law documented in
:mod:`heritrix_spark.config` — the BSP re-expression of Heritrix 1.x
WorkQueueFrontier semantics (reference anchors, class-level:
``org/archive/crawler/frontier/WorkQueueFrontier.java`` — ready/snoozed
queue rotation, session balances, budgets;
``BdbMultipleWorkQueues.java#calculateInsertKey`` — the per-queue
``(directive, cost, ordinal)`` priority order;
``AbstractFrontier.java`` — politeness + retry policy;
``prefetch/PreconditionEnforcer.java`` — dns/robots prerequisites).

The Spark engine (heritrix_spark/plans/crawl_job.py) must reproduce this
simulator's fetch log event-for-event, and its final URL-seen set exactly
(BASELINE.json north_rule).  ~10^4-URL fixtures run in seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.operators import postfetch
from heritrix_spark.functions.canonicalize import (
    canonicalize_py,
    host_of_py,
    path_of_py,
)
from heritrix_spark.functions.cost import POLICIES_PY
from heritrix_spark.functions.queue_assign import queue_key_py
from heritrix_spark.functions.fingerprint import url_fp_py
from heritrix_spark.operators.scope import scope_accepts_py


@dataclass
class Item:
    url: str
    canon: str
    fp: int
    kind: str
    directive: int
    cost: int
    ordinal: int
    hops_path: str
    via: str
    is_seed: bool
    retries: int = 0
    earliest_ts: int = 0

    def sort_key(self) -> tuple:
        return (self.directive, self.cost, self.ordinal)


@dataclass
class Queue:
    class_key: str
    wake_ts: int = 0
    balance: int = 0
    expenditure: int = 0
    retired: bool = False
    next_ordinal: int = 0
    sgroup: int = 0  # settings sheet (O5): 0=global, i+1=host_settings[i]
    successes: int = 0  # real-fetch 200s (QuotaEnforcer counter)
    fetches: int = 0  # real-fetch responses, any status
    bytes: int = 0  # success payload bytes (virtual lattice)
    items: list[Item] = field(default_factory=list)


class HeritrixSim:
    """Event-exact simulator of the engine's superstep law."""

    def __init__(self, spec: websim.FixtureSpec, cfg: C.CrawlConfig):
        self.spec = spec
        self.cfg = cfg
        self.cost_of = POLICIES_PY[cfg.cost_policy]
        self.robots: dict[str, list[tuple[str, bool]]] = {}
        for host, prefix, allow, _ in websim.robots_rules(spec):
            self.robots.setdefault(host, []).append((prefix, allow))
        self.delays = websim.crawl_delays(spec)
        self.set_config(cfg)
        self.queues: dict[str, Queue] = {}
        self.seen: set[str] = set()
        self.fetch_log: list[dict[str, Any]] = []
        self.now = 0
        self.step = 0

    def set_config(self, cfg: C.CrawlConfig) -> None:
        """Swap the live config (mid-crawl scope tightening, P1 recheck
        tests) — derived caches are rebuilt; queue state is untouched."""
        self.cfg = cfg
        self.cost_of = POLICIES_PY[cfg.cost_policy]
        self.prefixes = sorted(cfg.surt_prefixes)

    # -- scheduling ---------------------------------------------------------

    def _get_queue(self, class_key: str, discovery_ts: int,
                   host: str) -> Queue:
        """Queue of ``class_key``, creating it on first use, plus the
        idempotent per-candidate prerequisite attempt (PreconditionEnforcer
        P2): the candidate's HOST gets its dns:/robots items inserted into
        THIS queue unless their canons are already claimed.  Under the
        hostname policy this reduces exactly to insertion-at-queue-creation
        (later attempts find both canons claimed); under many-to-one
        policies (ip/bucket) each new host arriving in a shared queue
        still gets its prerequisites."""
        q = self.queues.get(class_key)
        if q is None:
            sg = C.settings_group_of(self.cfg, host)
            q = Queue(class_key, wake_ts=discovery_ts,
                      balance=C.effective_settings(
                          self.cfg, sg)["balance_replenish"],
                      sgroup=sg)
            self.queues[class_key] = q
        for kind, url in ((C.KIND_DNS, f"dns:{host}"),
                          (C.KIND_ROBOTS, f"http://{host}/robots.txt")):
            canon = canonicalize_py(url)
            if canon in self.seen:
                continue
            self.seen.add(canon)
            q.items.append(Item(
                url=url, canon=canon, fp=url_fp_py(canon), kind=kind,
                directive=C.HIGH, cost=1, ordinal=q.next_ordinal,
                hops_path="P", via="", is_seed=False,
                earliest_ts=discovery_ts))
            q.next_ordinal += 1
        return q

    def schedule(self, url: str, hops_path: str, via: str, is_seed: bool,
                 directive: int, discovery_ts: int) -> bool:
        """Candidate pipeline: canonicalize → scope → seen → enqueue."""
        if not scope_accepts_py(self.cfg, url, hops_path, self.prefixes):
            return False
        canon = canonicalize_py(url)
        if canon in self.seen:
            return False
        self.seen.add(canon)
        q = self._get_queue(
            queue_key_py(url, self.cfg.queue_assignment,
                         self.cfg.queue_buckets),
            discovery_ts, host_of_py(url))
        q.items.append(Item(
            url=url, canon=canon, fp=url_fp_py(canon), kind=C.KIND_REAL,
            directive=directive, cost=self.cost_of(url),
            ordinal=q.next_ordinal, hops_path=hops_path, via=via,
            is_seed=is_seed, earliest_ts=discovery_ts))
        q.next_ordinal += 1
        return True

    def schedule_seeds(self, seed_urls: list[str]) -> None:
        for u in seed_urls:
            self.schedule(u, "", "", True, C.MEDIUM, 0)

    # -- fetch outcome law --------------------------------------------------

    def _robots_disallowed(self, url: str) -> bool:
        host = host_of_py(url)
        rules = self.robots.get(host)
        if not rules:
            return False
        path = path_of_py(url)
        if path == "/robots.txt":
            return False
        best_len, best_allow = -1, True
        for prefix, allow in rules:
            if path.startswith(prefix) and len(prefix) > best_len:
                best_len, best_allow = len(prefix), allow
        return best_len >= 0 and not best_allow

    def _extract_ok(self, item: Item, status: int, k: int | None) -> bool:
        """Post-fetch extraction gate (S10) — mirrors the engine's
        ``_postfetch_flags``: Content-Type is ``image/<fmt>`` from the
        fixture's deterministic format law, content-length is the virtual
        payload lattice the byte quotas charge."""
        if self.cfg.extract_rules is None:
            return True
        mime = "image/" + gen.fmt_of(k) if k is not None else ""
        return postfetch.gate_py(
            self.cfg.extract_rules, status, mime,
            C.payload_bytes_of(item.fp, item.kind))

    def _status(self, item: Item) -> int:
        if item.kind != C.KIND_REAL:
            return C.S_OK
        # Preselector re-check (P1) runs FIRST in the prefetch chain —
        # before the robots verdict and the quota gate.
        if (self.cfg.recheck_scope_at_dequeue
                and not scope_accepts_py(self.cfg, item.url, item.hops_path,
                                         self.prefixes)):
            return C.S_OUT_OF_SCOPE
        if self._robots_disallowed(item.url):
            return C.S_ROBOTS_PRECLUDED
        if C.is_retry_status(item.fp, item.retries):
            return C.S_RETRY
        k = websim.image_id_of_url(item.url)
        if k is None or k >= self.spec.n_images:
            return C.S_NOT_FOUND
        return C.S_OK

    # -- the superstep ------------------------------------------------------

    def run(self, max_steps: int | None = None) -> None:
        limit = max_steps if max_steps is not None else self.cfg.max_steps
        while self.step < limit and self._advance_clock():
            self._superstep()
            self.step += 1

    def _live_queues(self) -> list[Queue]:
        return [q for q in self.queues.values() if q.items and not q.retired]

    def _advance_clock(self) -> bool:
        ready = [max(q.wake_ts, min(i.earliest_ts for i in q.items))
                 for q in self._live_queues()]
        if not ready:
            return False
        self.now = max(self.now, min(ready))
        return True

    def _superstep(self) -> None:
        cfg, now = self.cfg, self.now
        eff_of = {g: C.effective_settings(cfg, g)
                  for g in {q.sgroup for q in self.queues.values()} | {0}}
        candidates: list[tuple[str, str, str, int]] = []  # url, hop, via, ts
        for q in sorted(self._live_queues(), key=lambda q: q.class_key):
            eff = eff_of[q.sgroup]
            s = max(q.wake_ts, now)
            eligible = sorted((i for i in q.items if i.earliest_ts <= s),
                              key=Item.sort_key)
            if not eligible:
                continue
            horizon = s + cfg.window_ms  # per-queue window
            charged = 0
            done: list[Item] = []
            for rn, item in enumerate(eligible):
                if rn >= cfg.burst_max or s >= horizon or charged >= q.balance:
                    break
                status = self._status(item)
                # QuotaEnforcer (P3): runs after the scope + robots
                # verdicts; an over-quota host's real items are
                # disregarded unfetched (count AND byte quotas).
                if (item.kind == C.KIND_REAL
                        and status not in (C.S_ROBOTS_PRECLUDED,
                                           C.S_OUT_OF_SCOPE)
                        and ((0 <= eff["max_successes_per_host"]
                              <= q.successes)
                             or (0 <= eff["max_fetches_per_host"]
                                 <= q.fetches)
                             or (0 <= eff["max_bytes_per_host"]
                                 <= q.bytes))):
                    status = C.S_BLOCKED_BY_QUOTA
                if status in (C.S_ROBOTS_PRECLUDED, C.S_BLOCKED_BY_QUOTA,
                              C.S_OUT_OF_SCOPE):
                    fetch_start = fetch_end = s
                    event = C.EV_DISREGARD
                    done.append(item)
                else:
                    if item.kind == C.KIND_REAL:
                        q.fetches += 1
                        if status == C.S_OK:
                            q.successes += 1
                            q.bytes += C.payload_bytes_of(item.fp, item.kind)
                    fetch_ms = C.fetch_ms_of(item.fp, item.kind)
                    delay = C.politeness_ms_of(
                        eff["delay_factor"], eff["min_delay_ms"],
                        eff["max_delay_ms"], cfg.honor_crawl_delay,
                        fetch_ms, self.delays.get(q.class_key, 0))
                    fetch_start, fetch_end = s, s + fetch_ms
                    s = fetch_end + delay
                    charged += item.cost
                    if status == C.S_OK:
                        event = C.EV_SUCCESS
                        done.append(item)
                        if item.kind == C.KIND_REAL:
                            k = websim.image_id_of_url(item.url)
                            if self._extract_ok(item, status, k):
                                for j, (turl, hop) in enumerate(
                                        websim.outlinks(k, self.spec)):
                                    candidates.append(
                                        (turl, item.hops_path + hop,
                                         item.url, fetch_end))
                    elif status == C.S_RETRY and item.retries < cfg.max_retries:
                        event = C.EV_RETRY
                        charged += cfg.error_penalty
                        item.retries += 1
                        item.earliest_ts = fetch_end + cfg.retry_delay_ms
                    else:
                        event = C.EV_FAILURE
                        charged += cfg.error_penalty
                        done.append(item)
                self.fetch_log.append({
                    "step": self.step, "class_key": q.class_key,
                    "url": item.url, "canon_url": item.canon,
                    "kind": item.kind, "directive": item.directive,
                    "cost": item.cost, "ordinal": item.ordinal,
                    "retries": item.retries, "status": status,
                    "fetch_start": fetch_start, "fetch_end": fetch_end,
                    "event": event,
                })
            if done:
                gone = {id(i) for i in done}
                q.items = [i for i in q.items if id(i) not in gone]
            q.wake_ts = s
            q.expenditure += charged
            q.balance -= charged
            if q.balance <= 0:
                q.balance = eff["balance_replenish"]
            if 0 <= eff["total_budget"] <= q.expenditure:
                q.retired = True
            if (0 <= eff["max_successes_per_host"] <= q.successes
                    or 0 <= eff["max_fetches_per_host"] <= q.fetches
                    or 0 <= eff["max_bytes_per_host"] <= q.bytes):
                q.retired = True  # quota exhausted — queue retired
        for url, hops, via, ts in candidates:
            self.schedule(url, hops, via, False, C.NORMAL, ts)


def run_crawl(spec_name: str = "tiny",
              cfg: C.CrawlConfig | None = None,
              max_steps: int | None = None) -> HeritrixSim:
    spec = websim.SPECS[spec_name]
    if cfg is None:
        cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())
    sim = HeritrixSim(spec, cfg)
    sim.schedule_seeds(websim.seeds(spec))
    sim.run(max_steps)
    return sim
