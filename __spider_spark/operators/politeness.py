"""Politeness budget clipping: salted two-phase top-k per host.

Reference analogue: throughput throttling via ``CONCURRENT_REQUESTS=4..6`` /
``DOWNLOAD_DELAY=2..3s`` (/root/reference/settings.py:32,37-38) plus ad-hoc
sleeps (ctripSpider.py:229) — i.e. a *per-process* rate limit. The engine
expresses the same contract declaratively: **at most ``budget`` URLs per
host per scheduling round**, picked deterministically by
``(priority DESC, url_hash ASC)`` so crawl order replays byte-for-byte at
any parallelism (SURVEY.md §2.5/O3).

Skew (SURVEY.md §7 hard part (e)): a hot host holding 50% of the frontier
would put 50% of rows in one window partition. Salting fixes the
*parallelism*, not the *budget*: phase 1 ranks within ``(host, salt)`` where
``salt = pmod(url_hash, S)`` and keeps ``budget`` rows per salt bucket
(a safe over-selection of ≤ budget*S per host, each bucket processed on a
different core/executor); phase 2 re-ranks only those ≤ budget*S survivors
per *unsalted* host and keeps ``budget``. Phase-2 partitions are tiny by
construction, so the hot host can no longer straggle a stage. AQE skew-join
handling remains on as a backstop (session.py).

Budgets come from a small per-host config relation (FIXTURES.md §5)
broadcast-joined onto the frontier (reference analogue: the broadcast
airport dimension, SURVEY.md §2.3 J2); hosts without a row fall back to
``default_budget``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def clip_wave(
    frontier: DataFrame,
    budgets: DataFrame | None = None,
    default_budget: int = 4,
    salt_buckets: int = 8,
) -> DataFrame:
    """Select this round's fetch wave: ≤ budget(host) URLs per host,
    deterministic order (priority DESC, url_hash ASC). Input must carry
    (host, url_hash, priority); all columns pass through."""
    df = frontier
    if budgets is not None:
        df = df.join(F.broadcast(budgets), "host", "left").withColumn(
            "__budget", F.coalesce(F.col("budget"), F.lit(default_budget))
        ).drop("budget")
    else:
        df = df.withColumn("__budget", F.lit(default_budget))

    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    w1 = Window.partitionBy("host", salt).orderBy(
        F.col("priority").desc(), F.col("url_hash").asc()
    )
    survivors = df.withColumn("__rn1", F.row_number().over(w1)).filter(
        F.col("__rn1") <= F.col("__budget")
    )
    w2 = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url_hash").asc()
    )
    return (
        survivors.withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") <= F.col("__budget"))
        .drop("__rn1", "__rn2", "__budget")
    )
