"""Single-process reference simulator (SURVEY.md §5.2).

Implements the reference crawler's *semantics* — deterministic seed-order
crawl (seed order × ascending schedule, /root/reference/spiders/
ctripSpider.py:136-154), durable seen-set (Redis sadd sink,
YlTwistPipeline.py:66-89), per-host politeness budget (settings.py:32,37),
fetch + parse + sink — as a tiny pure-Python loop with NO Spark, so the
Spark engine can be pinned against it (north_rule: identical crawl
ordering, identical URL-seen membership, byte-identical extracted text
under the same seed list and politeness budget).

It shares only the *pure scalar functions* with the engine (URL
canonicalizer, text extractor, XXH64) — the dataflow (frontier state,
dedup, budget clipping, discovery, ordering) is re-implemented
independently with plain dicts/sorts, which is exactly what makes the
equivalence test meaningful for the distributed operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

from .functions.hashing import spark_xxhash64_str
from .functions.text import extract_links_one, extract_text_one
from .functions.urls import canonicalize_one, host_of_one, resolve_one
from .operators.robots import allowed_one, parse_robots, robots_budgets


@dataclass
class SimResult:
    waves: list[list[int]]          # per round: url_hash in fetch order
    seen: set[int]                  # final url_hash membership
    texts: dict[str, str]           # canonical url -> extracted text
    statuses: dict[str, int]        # canonical url -> 200/404
    metrics: list[dict]


def _frontier_entry_key(e: dict) -> tuple:
    """Duplicate-resolution order: priority DESC, round ASC,
    parent_url ASC NULLS FIRST, seed_index ASC NULLS FIRST."""
    return (
        -e["priority"],
        e["round"],
        e["parent_url"] is not None,
        e["parent_url"] or "",
        e["seed_index"] is None,
        e["seed_index"] or 0,
    )


def simulate_crawl(
    pages: dict[str, bytes],            # canonical url -> html
    seed_urls: list[str],               # raw seed list, file order
    n_rounds: int,
    default_budget: int = 4,
    budgets: dict[str, int] | None = None,
    robots: dict[str, str] | None = None,
    priority_decay: float = 0.5,
    round_seconds: float = 60.0,
) -> SimResult:
    merged = robots_budgets(robots or {}, round_seconds)
    merged.update(budgets or {})
    budgets = merged
    robots_rules = {h: parse_robots(b) for h, b in (robots or {}).items()}

    # seed frontier: canonicalize, dedup by hash (min seed_index wins)
    frontier: dict[int, dict] = {}
    for i, raw in enumerate(seed_urls, start=1):
        if raw is None or not raw.strip():
            continue
        u = canonicalize_one(raw)
        e = {
            "url": u, "url_hash": spark_xxhash64_str(u),
            "host": host_of_one(u), "priority": 1.0, "round": 1,
            "parent_url": None, "seed_index": i,
        }
        cur = frontier.get(e["url_hash"])
        if cur is None or _frontier_entry_key(e) < _frontier_entry_key(cur):
            frontier[e["url_hash"]] = e

    seen: set[int] = set()
    waves, texts, statuses, metrics = [], {}, {}, []

    for k in range(1, n_rounds + 1):
        if not frontier:
            break
        candidates = [e for h, e in frontier.items() if h not in seen]

        allowed, blocked = [], []
        for e in candidates:
            path = urlsplit(e["url"]).path or "/"
            ok = allowed_one(robots_rules.get(e["host"]), path)
            (allowed if ok else blocked).append(e)

        # per-host budget, order (priority DESC, url_hash ASC)
        by_host: dict[str, list[dict]] = {}
        for e in allowed:
            by_host.setdefault(e["host"], []).append(e)
        wave: list[dict] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e["priority"], e["url_hash"]))
            wave.extend(entries[: budgets.get(host, default_budget)])
        wave.sort(key=lambda e: (-e["priority"], e["url_hash"]))
        waves.append([e["url_hash"] for e in wave])

        n_ok = 0
        discovered: dict[int, dict] = {}
        for e in wave:
            html = pages.get(e["url"])
            if html is None:
                statuses[e["url"]] = 404
                continue
            statuses[e["url"]] = 200
            n_ok += 1
            texts[e["url"]] = extract_text_one(html)
            for raw_link in extract_links_one(html):
                u = resolve_one(e["url"], raw_link)
                if not u:
                    continue
                d = {
                    "url": u, "url_hash": spark_xxhash64_str(u),
                    "host": host_of_one(u),
                    "priority": e["priority"] * priority_decay,
                    "round": k + 1,
                    "parent_url": e["url"], "seed_index": e["seed_index"],
                }
                cur = discovered.get(d["url_hash"])
                if cur is None or _frontier_entry_key(d) < _frontier_entry_key(cur):
                    discovered[d["url_hash"]] = d

        newly_seen = {e["url_hash"] for e in wave} | {
            e["url_hash"] for e in blocked
        }
        seen |= newly_seen

        merged: dict[int, dict] = {}
        for e in list(frontier.values()) + list(discovered.values()):
            if e["url_hash"] in seen:
                continue
            cur = merged.get(e["url_hash"])
            if cur is None or _frontier_entry_key(e) < _frontier_entry_key(cur):
                merged[e["url_hash"]] = e
        frontier = merged

        metrics.append({
            "round": k, "wave": len(wave), "fetched_200": n_ok,
            "fetched_404": len(wave) - n_ok, "robots_blocked": len(blocked),
            "discovered": len(discovered),
        })

    return SimResult(waves, seen, texts, statuses, metrics)
