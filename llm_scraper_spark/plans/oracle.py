"""Sequential pure-Python reference oracle for the crawl.

A mini-implementation of the reference's imperative loop semantics —
``VISITED`` list + ``set()`` dedup (extract_product_urls.py:12,39-41,
57), sequential per-URL fetch with per-host sleeps (scrape_eccomerce.py
:55,121-124), pagination BFS (extract_product_urls.py:121-133) — run
one URL at a time with plain dicts/lists/sets.  No Spark, no pandas.

It defines the golden crawl ordering, final URL-seen set, and
per-document span sequences that the distributed engine
(operators/frontier.py + plans/crawler.py) must reproduce exactly.
Ordering is a pure function of the data: within a round, candidates
sort by (priority, host, url_hash); per-host politeness slot = rank
within host; a host fetches at local time slot*crawl_delay_ms, capped
by the round budget.  The engine computes the identical function with
an anti-join + window; the oracle computes it with sorted lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.urls import canonicalize_one, host_of, url_hash_one
from ..sources.synthweb import page_outlinks, page_spans

DEFAULT_CRAWL_DELAY_MS = 1000


@dataclass
class OracleResult:
    # (round, slot, host, url, url_hash, priority, depth) in fetch order
    fetch_log: list[tuple] = field(default_factory=list)
    seen: dict[str, int] = field(default_factory=dict)  # url -> first_round
    documents: dict[str, list[dict]] = field(default_factory=dict)
    rounds_run: int = 0


def crawl_oracle(
    seed_list: list[str],
    robots_rows: list[dict],
    *,
    budget_ms: int = 2000,
    max_rounds: int = 5,
) -> OracleResult:
    robots = {
        r["host"]: (r.get("disallow_prefix"), r.get("crawl_delay_ms"))
        for r in robots_rows
    }

    # frontier: url -> (depth, discovered_round); seeds dedup first-wins
    frontier: dict[str, tuple[int, int]] = {}
    for raw in seed_list:
        cu = canonicalize_one(raw)
        if cu is not None and cu not in frontier:
            frontier[cu] = (0, 0)

    res = OracleResult()
    for r in range(max_rounds):
        if not frontier:
            break
        res.rounds_run = r + 1

        # J3 analog: drop already-seen
        cands = [
            (float(depth), host_of(u), url_hash_one(u), u, depth, disc)
            for u, (depth, disc) in frontier.items()
            if u not in res.seen
        ]

        # robots gate: blocked → seen (never rescheduled), not fetched
        allowed = []
        for prio, host, uh, u, depth, disc in cands:
            dis, _delay = robots.get(host, (None, None))
            path = "/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
            if dis is not None and path.startswith(dis):
                res.seen[u] = r
            else:
                allowed.append((prio, host, uh, u, depth, disc))

        # politeness: per-host slot in (priority, url_hash) order
        allowed.sort(key=lambda t: (t[0], t[1], t[2]))
        slot_of_host: dict[str, int] = {}
        deferred: dict[str, tuple[int, int]] = {}
        fetched: list[tuple] = []
        for prio, host, uh, u, depth, disc in allowed:
            slot = slot_of_host.get(host, 0) + 1
            slot_of_host[host] = slot
            _dis, delay = robots.get(host, (None, None))
            delay = delay or DEFAULT_CRAWL_DELAY_MS
            host_budget = max(1, budget_ms // delay)
            if slot <= host_budget:
                fetched.append((r, slot, host, u, uh, prio, depth))
            else:
                deferred[u] = (depth, disc)

        # fetch + extract (deterministic synthetic web)
        new_links: dict[str, int] = {}  # url -> min depth
        for (rr, slot, host, u, uh, prio, depth) in fetched:
            res.fetch_log.append((rr, slot, host, u, uh, prio, depth))
            res.seen[u] = r
            res.documents[u] = page_spans(u)
            for raw in page_outlinks(u):
                cu = canonicalize_one(raw, base=u)
                if cu is None:
                    continue
                d = depth + 1
                if cu in new_links:
                    new_links[cu] = min(new_links[cu], d)
                else:
                    new_links[cu] = d

        # next frontier = deferred ∪ (new ⟕anti seen ⟕anti deferred)
        frontier = dict(deferred)
        for cu, d in new_links.items():
            if cu not in res.seen and cu not in frontier:
                frontier[cu] = (d, r + 1)

    return res
