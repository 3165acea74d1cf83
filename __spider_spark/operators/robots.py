"""robots.txt gate: broadcast per-host rule cache + vectorized allow check.

The reference crawls with ``ROBOTSTXT_OBEY = False``
(/root/reference/settings.py:21) — the engine makes compliance a first-class
operator instead (north_star requirement). Robots bodies form a small
per-host relation (FIXTURES.md §5) parsed ONCE on the driver into
{host: (disallow_prefixes, allow_prefixes)} for User-agent ``*`` and
broadcast; the check is an Arrow-batched pandas UDF over (host, path).

Longest-match-wins between Allow and Disallow (Google's documented
semantics); empty Disallow value means allow-all; unknown host => allowed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def parse_robots(body: str) -> tuple[list[str], list[str]]:
    """Parse one robots.txt body → (disallow, allow) prefix lists for UA *."""
    dis: list[str] = []
    allow: list[str] = []
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
                dis.append(val)
        elif applies and key == "allow":
            if val:
                allow.append(val)
    return dis, allow


def allowed_one(rules: tuple[list[str], list[str]] | None, path: str) -> bool:
    if not rules:
        return True
    dis, allow = rules
    best_dis = max((len(p) for p in dis if path.startswith(p)), default=-1)
    best_allow = max((len(p) for p in allow if path.startswith(p)), default=-1)
    return best_allow >= best_dis


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
