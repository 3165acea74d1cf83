"""robots.txt gate: broadcast per-host rule cache + vectorized allow check.

The reference crawls with ``ROBOTSTXT_OBEY = False``
(/root/reference/settings.py:21) — the engine makes compliance a first-class
operator instead (north_star requirement). Robots bodies form a small
per-host relation (FIXTURES.md §5) parsed ONCE on the driver for
User-agent ``*`` and broadcast; the check is an Arrow-batched pandas UDF
over (host, path).

Semantics (Google's documented robots rules):
  * ``*`` in a pattern matches any character sequence; ``$`` anchors the
    pattern end; otherwise prefix match;
  * most-specific (longest pattern) wins between Allow and Disallow,
    Allow wins ties;
  * empty Disallow value = allow-all; unknown host = allowed;
  * ``Crawl-delay`` maps onto the engine's politeness budget:
    budget_per_round = round_seconds / delay (the declarative form of the
    reference's DOWNLOAD_DELAY throttle, settings.py:37).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None


def _pattern_regex(pattern: str) -> re.Pattern[str]:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def parse_robots(body: str) -> RobotsRules:
    """Parse one robots.txt body for User-agent ``*``."""
    rules = RobotsRules()
    applies = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow":
            if val:
                rules.disallow.append(val)
        elif applies and key == "allow":
            if val:
                rules.allow.append(val)
        elif applies and key == "crawl-delay":
            try:
                rules.crawl_delay = float(val)
            except ValueError:
                pass
    return rules


def _best_match(patterns: list[str], path: str) -> int:
    """Length of the most specific matching pattern; -1 if none match."""
    best = -1
    for p in patterns:
        if _pattern_regex(p).match(path) and len(p) > best:
            best = len(p)
    return best


def allowed_one(rules: RobotsRules | None, path: str) -> bool:
    if rules is None:
        return True
    best_dis = _best_match(rules.disallow, path)
    best_allow = _best_match(rules.allow, path)
    return best_allow >= best_dis


def robots_budgets(robots_bodies: dict[str, str],
                   round_seconds: float = 60.0) -> dict[str, int]:
    """Crawl-delay directives → per-host politeness budgets
    (budget = how many polite fetches fit in one scheduling round)."""
    out = {}
    for host, body in robots_bodies.items():
        delay = parse_robots(body).crawl_delay
        if delay and delay > 0:
            out[host] = max(1, int(round_seconds / delay))
    return out


def robots_allowed_udf(spark: SparkSession, robots_bodies: dict[str, str]):
    """Build the vectorized (host, path) -> allowed predicate."""
    parsed = {h: parse_robots(b) for h, b in robots_bodies.items()}
    bc = spark.sparkContext.broadcast(parsed)

    @pandas_udf(BooleanType())
    def robots_allowed(host: pd.Series, path: pd.Series) -> pd.Series:
        rules = bc.value
        return pd.Series(
            [allowed_one(rules.get(h), p if p else "/")
             for h, p in zip(host, path)]
        )

    return robots_allowed
