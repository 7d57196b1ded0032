"""Pure-Python single-threaded reference crawler (the semantic oracle).

A faithful restatement of the BFS semantics of the reference's cleanest
crawler (`/root/reference/legacy/globus/globus_crawler.py:105-150`: FIFO
frontier queue, visit-once, per-entry expand), extended with the
north-rule semantics the Ray engine must also implement:

  * canonicalized URLs key the seen set (discovery-time dedup);
  * per-host politeness budget: at most ``max_per_epoch(host)`` fetches
    per host per epoch, best (priority desc, url asc) first; the rest are
    deferred to the next epoch with state intact;
  * robots disallow-prefix filtering and a substring skip list on
    outlinks (`application.py:114-124` analog);
  * epoch = BFS superstep; crawl order within an epoch is the global
    (priority desc, url asc) order over admitted URLs;
  * priority is a pure function of the URL (seeds: 1.0) so the order is
    independent of which parent discovers a URL first (SURVEY.md §7.5).

The engine's equivalence contract vs this oracle (tests):
  (a) identical visited-URL multiset per epoch (⇒ identical crawl order,
      which is sort-defined), (b) row-for-row span-sequence equality
      (kind, text, media_ref, order), (c) identical final seen set.

~150 LoC, no Ray, no numpy in the hot loop — deliberately simple.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .config import CrawlConfig
from .sources.corpus import corpus_to_dict, load_robots
from .urls import canonicalize_url, host_of, is_flaky, priority_of


@dataclass
class OracleResult:
    # one record per fetch ATTEMPT, in crawl order:
    # (url, epoch, order_in_epoch, status, spans, priority)
    records: list[tuple] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    per_epoch_counts: list[dict] = field(default_factory=list)
    failed: list[tuple] = field(default_factory=list)  # (url, epoch, retries)
    # nested-content expansion (the decompressor analog,
    # `/root/reference/legacy/posix_crawler.py:114-147,150-185`):
    # extracted archive refs (the already-extracted set, `:131-134`) and
    # one record per member doc: (member_url, epoch, spans)
    extracted: set[str] = field(default_factory=set)
    member_records: list[tuple] = field(default_factory=list)

    def fetch_order(self) -> list[str]:
        return [r[0] for r in self.records]


def _deny_reason(
    url: str, host: str, robots: dict, skip: tuple[str, ...]
) -> str | None:
    """None = allowed; else 'skip' | 'robots' (separate counters)."""
    for s in skip:
        if s in url:
            return "skip"
    rules = robots.get(host)
    if rules:
        path = url.partition("://")[2]
        path = path[len(host):]  # '/p/3' or ''
        for prefix in rules:
            if path.startswith(prefix):
                return "robots"
    return None


def oracle_crawl(config: CrawlConfig) -> OracleResult:
    corpus = corpus_to_dict(config.corpus_dir)
    robots = load_robots(config.corpus_dir)
    skip = tuple(config.skip_substrings)
    pol = config.politeness

    res = OracleResult()
    # frontier entries: (url, priority, retries); seen-at-discovery
    frontier: list[tuple[str, float, int]] = []
    for s in config.seeds:
        u = canonicalize_url(s)
        h = host_of(u)
        if u not in res.seen and _deny_reason(u, h, robots, skip) is None:
            res.seen.add(u)
            frontier.append((u, 1.0, 0))

    for epoch in range(config.max_epochs):
        if not frontier:
            break
        # politeness admission: per host, top max_per_epoch by (prio desc, url)
        by_host: dict[str, list[tuple[str, float, int]]] = {}
        for u, p, r in frontier:
            by_host.setdefault(host_of(u), []).append((u, p, r))
        admitted: list[tuple[str, float, int]] = []
        deferred: list[tuple[str, float, int]] = []
        politeness_wait_ms = 0
        for h, entries in by_host.items():
            entries.sort(key=lambda e: (-e[1], e[0]))
            k = pol.max_per_epoch(h)
            admitted.extend(entries[:k])
            deferred.extend(entries[k:])
            politeness_wait_ms += max(0, len(entries[:k]) - 1) * pol.min_gap_ms
        # crawl order: global (priority desc, url asc) over admitted
        admitted.sort(key=lambda e: (-e[1], e[0]))

        next_frontier: list[tuple[str, float, int]] = []
        n_dedup_hits = 0
        n_robots_denied = 0
        n_skip_filtered = 0
        n_archives = 0
        n_archives_dup = 0
        n_members = 0

        def process_spans(spans):
            """Links feed the frontier; compressed spans expand in-epoch
            into member records whose spans are processed recursively
            (the decompressor fixed point)."""
            nonlocal n_dedup_hits, n_robots_denied, n_skip_filtered
            nonlocal n_archives, n_archives_dup, n_members
            for kind, text, media_ref, _off in spans:
                if kind == "link":
                    link = canonicalize_url(media_ref)
                    lh = host_of(link)
                    reason = _deny_reason(link, lh, robots, skip)
                    if reason == "skip":
                        n_skip_filtered += 1
                        continue
                    if reason == "robots":
                        n_robots_denied += 1
                        continue
                    if link in res.seen:
                        n_dedup_hits += 1
                        continue
                    res.seen.add(link)
                    next_frontier.append((link, float(priority_of(link)), 0))
                elif kind == "compressed":
                    if media_ref in res.extracted:
                        n_archives_dup += 1
                        continue
                    res.extracted.add(media_ref)
                    n_archives += 1
                    for mem in json.loads(text)["members"]:
                        murl = f"{media_ref}#{mem['name']}"
                        mspans = [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in mem["spans"]
                        ]
                        res.member_records.append((murl, epoch, mspans))
                        n_members += 1
                        process_spans(mspans)

        for order, (u, p, r) in enumerate(admitted):
            spans = corpus.get(u)
            # deterministic transient failure: first attempt on a flaky URL
            if (spans is not None and config.flaky_every
                    and r == 0 and is_flaky(u, config.flaky_every)):
                res.records.append((u, epoch, order, 503, [], p))
                if r < config.max_retries:
                    next_frontier.append((u, p, r + 1))
                else:
                    res.failed.append((u, epoch, r))
                continue
            status = 200 if spans is not None else 404
            res.records.append((u, epoch, order, status, spans or [], p))
            if spans is None:
                continue
            process_spans(spans)

        res.per_epoch_counts.append(
            {
                "epoch": epoch,
                "urls_fetched": len(admitted),
                "dedup_hits": n_dedup_hits,
                "robots_denied": n_robots_denied,
                "skip_filtered": n_skip_filtered,
                "deferred": len(deferred),
                "discovered": len(next_frontier),
                "archives_expanded": n_archives,
                "archives_dup": n_archives_dup,
                "members_extracted": n_members,
                "politeness_wait_ms": politeness_wait_ms,
            }
        )
        frontier = deferred + next_frontier
    return res
