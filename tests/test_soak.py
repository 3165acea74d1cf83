"""Long-crawl soak: a year-long crawl must not degrade round over round.

The failure modes this pins (none visible in a 3-4 round test):
  * lakehouse fragment growth — every round appends a data dir per table;
    without compaction, reading ``seen`` unions O(rounds) fragments;
  * manifest/snapshot growth — O(rounds) manifests must not slow commits;
  * Bloom growth — the driver filter accretes every round's keys.

Strategy: many small rounds (tight budget on a deliberately link-rich
store) with compact_every on, then assert the LAST rounds are not
materially slower than the EARLY rounds (flat per-round wall time), and
that fragment counts stay bounded by the compaction cadence. Timing
asserts use a generous ratio (3x) so hypervisor noise can't flake the
suite while a real O(rounds) regression (which shows up as 5-10x by round
30) still fails.

Run with: pytest -m soak (excluded from the default suite via -m "not
soak" being unnecessary — it IS in the default suite but sized to ~2-3
min; mark allows skipping in quick loops).
"""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from __spider_spark.plans.crawl import CrawlConfig, run_crawl
from __spider_spark.sources.lakehouse import Lakehouse
from __spider_spark.sources.pages import generate_pages
from __spider_spark.sources.pages import seeds_df as make_seeds

N, HOSTS, SEEDS, ROUNDS = 1200, 16, 40, 30
COMPACT_EVERY = 5


@pytest.mark.soak
def test_long_crawl_flat_round_time(spark):
    pages = generate_pages(spark, N, HOSTS)
    seeds = make_seeds(spark, N, SEEDS, HOSTS)
    lake = Lakehouse(tempfile.mkdtemp(prefix="lake_soak_"))
    cfg = CrawlConfig(default_budget=2, compact_every=COMPACT_EVERY,
                      bloom_min_seen=0)

    times: list[float] = []
    k = 0
    while k < ROUNDS:
        t0 = time.perf_counter()
        out = run_crawl(spark, lake, pages, seeds, cfg, k + 1)
        times.append(time.perf_counter() - t0)
        if not out:  # frontier exhausted early — should not happen at
            break    # budget 2 with 600 link-rich pages
        k += 1
    assert k == ROUNDS, f"frontier exhausted after {k} rounds"

    # per-round wall time is flat: the median of the last 5 rounds must be
    # within 3x the median of rounds 3-7 (skip 1-2: warmup + seed wave)
    med = sorted(times[2:7])[2]
    med_late = sorted(times[-5:])[2]
    assert med_late <= 3.0 * med, (
        f"late rounds degraded: early median {med:.2f}s vs "
        f"late median {med_late:.2f}s — {times}")

    # fragment counts bounded by the compaction cadence, not O(rounds)
    snap = lake.snapshot()["tables"]
    for t in ("seen", "results", "errors", "metrics"):
        frags = len(snap.get(t, []))
        assert frags <= COMPACT_EVERY + 1, (t, frags)

    # seen-read cost flat too: reading the compacted seen table touches
    # a bounded number of files
    seen = lake.read(spark, "seen")
    n_files = seen.select(F.input_file_name()).distinct().count()
    assert n_files <= 4 * (COMPACT_EVERY + 1), n_files

    # sanity: the crawl actually crawled (each round terminal outcomes)
    assert seen.count() > ROUNDS  # at least ~budget per round accumulated
    lake.destroy()


BIG_N, BIG_HOSTS, BIG_SEEDS, BIG_ROUNDS = 1_000_000, 64, 20_000, 10


@pytest.mark.soak
def test_big_store_flat_round_time(spark, tmp_path):
    """Order-of-magnitude soak (VERDICT r3 #9): a 10^6-page store — 16x
    the headline bench — with curation, PageRank blend, and compaction
    all on. Waves stay budget-bounded (~19k URLs/round) while
    seen/results/frontier/edges accumulate, so a flat per-round wall pins
    that NO round cost is proportional to store or state size: scheduling
    never reads html, every join keys on url_hash against the
    once-per-crawl bucketed index, the Bloom prefilter keeps the
    anti-join's big side pruned, and compaction bounds fragment reads.
    (The small soak above pins fragment growth over MANY rounds; this one
    pins data-proportional growth at realistic scale.)"""
    pages_path = str(tmp_path / "pages")
    generate_pages(spark, BIG_N, BIG_HOSTS).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    from __spider_spark.plans.crawl import build_pages_index
    idx = build_pages_index(spark, pages)
    idx.count()  # index build is once-per-crawl input staging, not timed
    seeds = make_seeds(spark, BIG_N, BIG_SEEDS, BIG_HOSTS)
    lake = Lakehouse(tempfile.mkdtemp(prefix="lake_bigsoak_"))
    cfg = CrawlConfig(default_budget=300, compact_every=4, curate=True,
                      blend_pagerank_every=5, bloom_min_seen=0)
    times: list[float] = []
    waves: list[int] = []
    for k in range(BIG_ROUNDS):
        t0 = time.perf_counter()
        out = run_crawl(spark, lake, pages, seeds, cfg, k + 1,
                        pages_idx=idx)
        times.append(time.perf_counter() - t0)
        assert out, f"frontier exhausted after {k} rounds"
        waves.append(out[-1]["wave"])
    # flat wall: median of the last 3 rounds (one of which carries a
    # blend + compaction sweep) within 3x the median of rounds 2-4
    med_early = sorted(times[1:4])[1]
    med_late = sorted(times[-3:])[1]
    assert med_late <= 3.0 * med_early, (
        f"late rounds degraded: {med_early:.2f}s -> {med_late:.2f}s; "
        f"all: {[round(t, 2) for t in times]}")
    # waves really were budget-bounded and sustained (state kept growing)
    assert min(waves) >= 0.5 * max(waves) and max(waves) >= 15_000, waves
    idx.unpersist()
    lake.destroy()
