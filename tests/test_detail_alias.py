"""S6 keyed second-stage detail fetch + host-alias dim in the crawl path:
pure-function round-trips, engine-vs-simulator equivalence, missing-detail
404 semantics (SURVEY §2.1 S6, §2.2 P2/J3)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from __spider_spark.functions.detail import (
    cheapest_cabin_one,
    extract_detail_one,
)
from __spider_spark.functions.urls import canonicalize_one
from __spider_spark.operators.aliases import alias_one
from __spider_spark.plans.crawl import CrawlConfig, run_crawl
from __spider_spark.reference_sim import simulate_crawl
from __spider_spark.sources.lakehouse import Lakehouse
from __spider_spark.sources.pages import (
    build_detail_page,
    build_page,
    detail_cabins,
    detail_url_of,
    generate_detail_pages,
    generate_pages,
    has_detail,
    host_of_page,
    seed_urls,
)
from __spider_spark.sources.pages import seeds_df as make_seeds

N, HOSTS, SEEDS, ROUNDS = 300, 10, 24, 3


def _pages_dict():
    return {
        canonicalize_one(build_page(i, N, HOSTS)["url"]):
            build_page(i, N, HOSTS)["html"]
        for i in range(N)
    }


def _detail_dict():
    return {
        detail_url_of(i, HOSTS): build_detail_page(i)
        for i in range(N) if has_detail(i)
    }


# ---------- pure-function layer ----------

def test_detail_extract_roundtrip():
    hit = 0
    for i in range(60):
        html = build_detail_page(i)
        if html is None:
            assert not has_detail(i)
            continue
        hit += 1
        cabins = extract_detail_one(html)
        assert cabins == detail_cabins(i)
        best = cheapest_cabin_one(cabins)
        assert best == min(((p, c) for c, p in cabins))[::-1]
    assert hit > 40  # most pages do have details


def test_cheapest_cabin_tie_break():
    assert cheapest_cabin_one([("Y", 5.0), ("F", 5.0)]) == ("F", 5.0)
    assert cheapest_cabin_one([]) is None
    assert cheapest_cabin_one(None) is None


def test_alias_one_rewrites_host_only():
    aliases = {"www.a.test": "a.test"}
    assert alias_one("http://www.a.test/p?q=1", aliases) == \
        "http://a.test/p?q=1"
    assert alias_one("http://www.a.test:8080/p", aliases) == \
        "http://a.test:8080/p"
    assert alias_one("http://b.test/p", aliases) == "http://b.test/p"
    assert alias_one(None, aliases) is None


# ---------- engine vs simulator: detail stage ----------

@pytest.fixture(scope="module")
def detail_sim():
    return simulate_crawl(_pages_dict(), seed_urls(N, SEEDS, HOSTS), ROUNDS,
                          default_budget=4, detail_pages=_detail_dict())


@pytest.fixture(scope="module")
def detail_crawled(spark):
    lake = Lakehouse(tempfile.mkdtemp(prefix="lake_detail_"))
    run_crawl(
        spark, lake,
        generate_pages(spark, N, HOSTS),
        make_seeds(spark, N, SEEDS, HOSTS),
        CrawlConfig(default_budget=4, use_bloom=False),
        ROUNDS,
        detail_pages=generate_detail_pages(spark, N, HOSTS),
    )
    yield lake
    lake.destroy()


def test_detail_enrichment_matches_sim(spark, detail_crawled, detail_sim):
    rows = detail_crawled.read(spark, "details").collect()
    got = {
        r["url"]: (r["detail_url"], r["detail_status"],
                   [(c["cabin"], c["price"]) for c in r["cabins"]]
                   if r["cabins"] is not None else None,
                   r["min_cabin"], r["min_price"])
        for r in rows
    }
    want = {
        u: (d["detail_url"], d["status"], d["cabins"],
            d["min_cabin"], d["min_price"])
        for u, d in detail_sim.details.items()
    }
    assert len(rows) == len(got), "details must be one row per listing url"
    assert got == want


def test_content_derived_key_beats_convention(spark, detail_crawled):
    """Off-convention detail hrefs (variant 2: '?src=listing' query) must
    enrich successfully — the synthesized '/detail' suffix key would 404
    on every one of them. Also pins variant coverage in the fixture and
    the query-aware fallback for no-link pages (variant 3)."""
    from __spider_spark.sources.pages import (
        canonical_url, detail_variant)
    rows = {r["url"]: r
            for r in detail_crawled.read(spark, "details").collect()}
    by_variant: dict[int, int] = {}
    checked_v2 = 0
    for i in range(N):
        u = canonical_url(i, HOSTS)
        r = rows.get(u)
        if r is None:
            continue  # not crawled within ROUNDS
        v = detail_variant(i)
        by_variant[v] = by_variant.get(v, 0) + 1
        assert r["detail_url"] == detail_url_of(i, HOSTS)
        if v == 2 and has_detail(i):
            assert r["detail_status"] == 200, \
                f"page {i}: off-convention key must hit the store"
            checked_v2 += 1
    assert set(by_variant) == {0, 1, 2, 3}, by_variant
    assert checked_v2 >= 3


def test_suffix_fallback_is_query_aware(spark):
    """A listing URL that itself carries a query string gets the /detail
    segment inserted BEFORE the '?', not appended inside the query."""
    from __spider_spark.plans.detail import derive_detail_key
    listing = spark.createDataFrame(
        [(1, "http://h.test/p?q=1"), (2, "http://h.test/p"),
         (3, "http://h.test/p?a=1&b=2")],
        "url_hash long, url string")
    got = {r["url"]: r["detail_url"]
           for r in derive_detail_key(listing).collect()}
    assert got == {
        "http://h.test/p?q=1": "http://h.test/p/detail?q=1",
        "http://h.test/p": "http://h.test/p/detail",
        "http://h.test/p?a=1&b=2": "http://h.test/p/detail?a=1&b=2",
    }


def test_missing_detail_is_404_with_null_enrichment(spark, detail_crawled,
                                                    detail_sim):
    rows = detail_crawled.read(spark, "details").collect()
    n404 = 0
    for r in rows:
        if r["detail_status"] == 404:
            n404 += 1
            assert r["cabins"] is None
            assert r["min_cabin"] is None and r["min_price"] is None
        else:
            assert r["min_price"] is not None
    want404 = sum(1 for d in detail_sim.details.values()
                  if d["status"] == 404)
    assert n404 == want404 and n404 > 0


def test_detail_rows_cover_exactly_fetched_200(spark, detail_crawled,
                                               detail_sim):
    res = detail_crawled.read(spark, "results")
    ok_urls = {r["url"] for r in
               res.filter(F.col("status") == 200).select("url").collect()}
    detail_urls = {r["url"] for r in
                   detail_crawled.read(spark, "details")
                   .select("url").collect()}
    assert detail_urls == ok_urls == set(detail_sim.details)


# ---------- engine vs simulator: alias dim in the crawl path ----------

ALIASES = {f"www.host{h}.test": f"host{h}.test" for h in range(HOSTS)}


def _aliased_seed_urls():
    """Seeds naming the www mirror of each page's host — only resolvable
    once the alias dim collapses them onto the canonical host."""
    return [
        f"http://www.host{host_of_page(i, HOSTS)}.test/p{i}"
        for i in range(SEEDS)
    ]


@pytest.fixture(scope="module")
def alias_sim():
    return simulate_crawl(_pages_dict(), _aliased_seed_urls(), ROUNDS,
                          default_budget=4, aliases=dict(ALIASES))


@pytest.fixture(scope="module")
def alias_crawled(spark):
    lake = Lakehouse(tempfile.mkdtemp(prefix="lake_alias_"))
    seeds = spark.createDataFrame(
        [(i + 1, u) for i, u in enumerate(_aliased_seed_urls())],
        "seed_index long, url string")
    metrics = run_crawl(
        spark, lake,
        generate_pages(spark, N, HOSTS),
        seeds,
        CrawlConfig(default_budget=4, use_bloom=False,
                    aliases=dict(ALIASES)),
        ROUNDS,
    )
    yield lake, metrics
    lake.destroy()


def test_alias_crawl_order_matches_sim(spark, alias_crawled, alias_sim):
    lake, _ = alias_crawled
    res = lake.read(spark, "results")
    got = {}
    for r in res.select("round", "fetch_order", "url_hash").collect():
        got.setdefault(r["round"], []).append(
            (r["fetch_order"], r["url_hash"]))
    got_waves = [
        [h for _, h in sorted(got[k])] for k in sorted(got)
    ]
    sim_waves = [w for w in alias_sim.waves if w]
    assert got_waves == sim_waves


def test_alias_collapses_to_canonical_hosts(spark, alias_crawled, alias_sim):
    lake, _ = alias_crawled
    res = lake.read(spark, "results")
    hosts = {r["host"] for r in res.select("host").distinct().collect()}
    assert hosts and all(not h.startswith("www.") for h in hosts)
    seen = {r["url_hash"] for r in
            lake.read(spark, "seen").select("url_hash").collect()}
    assert seen == alias_sim.seen
    # texts byte-identical under aliasing (north_rule invariant)
    texts = {r["url"]: r["text"] for r in
             res.filter(F.col("status") == 200)
             .select("url", "text").collect()}
    assert texts == alias_sim.texts
