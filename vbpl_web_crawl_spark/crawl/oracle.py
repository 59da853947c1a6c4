"""Single-threaded pure-Python crawl oracle (SURVEY.md §5.2 item 2).

Computes the *canonical* crawl order — phase/depth -> document type ->
discovery time, per the north_rule priority — over the same synthetic
site graph, with the same politeness budgets and retry semantics as the
Spark engine. The reference's actual thread interleaving is racy
(SURVEY §4 determinism note); this oracle is the well-defined logical
order both must match.

The equality tests assert:
- visit sequence (url list in visit_seq order) identical,
- final URL-seen set identical,
- per-host per-round fetch counts never exceed the politeness budget.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from vbpl_web_crawl_spark.crawl import politeness as P
from vbpl_web_crawl_spark.sources import synth_site as SITE

_DOCMAP_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)/docmap/([^/?#]+)")
_DOCMAP_ITEM_RE = re.compile(r"[?&]ItemID=(\d+)")
_DOCMAP_TITLE_RE = re.compile(r"[?&]t=([^&#]+)")


def resolve_docmap(url: str) -> str:
    """Pure-Python mirror of functions.scalars.resolve_docmap_link (J7),
    same semantics in the same order: ItemID (any param position) ->
    direct doc URL; else t -> search URL; else the URL unchanged."""
    m = _DOCMAP_RE.match(url)
    if not m:
        return url
    scheme_host, doc_class = m.groups()
    mi = _DOCMAP_ITEM_RE.search(url)
    if mi:
        return f"{scheme_host}/doc/{doc_class}/{mi.group(1)}"
    mt = _DOCMAP_TITLE_RE.search(url)
    if mt:
        return f"{scheme_host}/search/{doc_class}?q={mt.group(1)}"
    return url


@dataclass
class OracleResult:
    visit_order: list[str] = field(default_factory=list)
    visits: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    rounds: int = 0
    per_round_host_counts: list[dict] = field(default_factory=list)
    images: set[str] = field(default_factory=set)


def run_oracle(
    site: SITE.SiteConfig,
    robots: dict,
    round_window_s: float = 60.0,
    max_retries: int = 3,
    max_rounds: int = 1000,
    seed_list: list | None = None,
) -> OracleResult:
    budgets = {
        h: P.host_budget(r.get("crawl_delay", P.DEFAULT_CRAWL_DELAY), round_window_s)
        for h, r in robots.items()
    }

    def host_of(url: str) -> str:
        return url.split("://", 1)[1].split("/", 1)[0]

    def disallowed(url: str) -> bool:
        h = host_of(url)
        path = "/" + url.split("://", 1)[1].split("/", 1)[1] if "/" in url.split("://", 1)[1] else "/"
        for prefix in robots.get(h, {}).get("disallow", ()):
            if path.startswith(prefix):
                return True
        return False

    res = OracleResult()
    # pending rows: dicts with url, depth, doc_type, rank, seq, retry
    pending: list[dict] = []
    next_seq = 0
    seeds = seed_list if seed_list is not None else SITE.seed_urls(site)
    for url, dt in seeds:
        pending.append(
            {
                "url": url,
                "depth": 0,
                "doc_type": dt,
                "rank": SITE.DOC_TYPE_RANK[dt],
                "seq": next_seq,
                "retry": 0,
            }
        )
        res.seen.add(url)
        next_seq += 1

    total_visits = 0
    rnd = 0
    while pending and rnd < max_rounds:
        rnd += 1
        # 1. schedule per host by priority, cut at budget
        pending.sort(key=lambda r: (r["depth"], r["rank"], r["seq"]))
        taken_per_host: dict[str, int] = {}
        scheduled, deferred = [], []
        for row in pending:
            h = host_of(row["url"])
            b = budgets.get(h, 1)
            if taken_per_host.get(h, 0) < b:
                taken_per_host[h] = taken_per_host.get(h, 0) + 1
                scheduled.append(row)
            else:
                deferred.append(row)
        res.per_round_host_counts.append(dict(taken_per_host))

        # 2. canonical visit order across the whole round
        scheduled.sort(key=lambda r: (r["depth"], r["rank"], r["seq"]))
        candidates: list[dict] = []  # retries first (mirrors engine dedup)
        link_buffer: list[tuple[int, int, str, str, int]] = []
        for row in scheduled:
            visit_seq = total_visits
            total_visits += 1
            page = SITE.fetch(site, row["url"], attempt=row["retry"])
            res.visit_order.append(row["url"])
            res.visits.append(
                {
                    "visit_seq": visit_seq,
                    "round": rnd,
                    "url": row["url"],
                    "depth": row["depth"],
                    "doc_type": row["doc_type"],
                    "retry_count": row["retry"],
                    "status": page.status,
                }
            )
            if page.status >= 500 and row["retry"] < max_retries:
                res.seen.discard(row["url"])  # cuckoo/exact delete
                candidates.append({**row, "retry": row["retry"] + 1, "is_new": 0})
                continue
            if page.status != 200:
                continue
            if page.image_id is not None:
                res.images.add(page.image_id)
            for u, dt, pos in page.links:
                link_buffer.append((visit_seq, pos, resolve_docmap(u), dt, row["depth"] + 1))

        # 5. expand: robots filter, dedup (retries first, then first
        # discovery), unseen gate, canonical seq assignment
        link_buffer.sort(key=lambda t: (t[0], t[1]))
        seen_in_round = {c["url"] for c in candidates}
        new_links = []
        for parent_seq, pos, u, dt, depth in link_buffer:
            if disallowed(u) or u in seen_in_round:
                continue
            seen_in_round.add(u)
            new_links.append((parent_seq, pos, u, dt, depth))
        # admit
        for c in candidates:  # retries re-admitted with original seq
            res.seen.add(c["url"])
            pending_row = {k: c[k] for k in ("url", "depth", "doc_type", "rank", "seq")}
            pending_row["retry"] = c["retry"]
            deferred.append(pending_row)
        new_links.sort(key=lambda t: (t[0], t[1], t[2]))
        for parent_seq, pos, u, dt, depth in new_links:
            if u in res.seen:
                continue
            res.seen.add(u)
            deferred.append(
                {
                    "url": u,
                    "depth": depth,
                    "doc_type": dt,
                    "rank": SITE.DOC_TYPE_RANK[dt],
                    "seq": next_seq,
                    "retry": 0,
                }
            )
            next_seq += 1
        pending = deferred

    res.rounds = rnd
    return res
