"""Relative-href discovery through the FULL engine vs the simulator.

The generated page store links absolutely; real pages don't. This crafts a
tiny site with relative / scheme-relative / fragment / parent-dir hrefs and
pins engine crawl order + seen-set + text to the simulator."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from __spider_spark.functions.urls import canonicalize_one
from __spider_spark.plans.crawl import CrawlConfig, run_crawl
from __spider_spark.reference_sim import simulate_crawl
from __spider_spark.sources.lakehouse import Lakehouse

SITE = {
    "http://a.test/": """<html><body><h1>home</h1>
        <p><a href="dir/one">one</a></p>
        <p><a href="/two">two</a></p>
        <p><a href="//b.test/three">three</a></p>
        <p><a href="#frag">self</a></p></body></html>""",
    "http://a.test/dir/one": """<html><body><h1>one</h1>
        <p><a href="../two">up-two</a></p>
        <p><a href="sub/deep">deep</a></p></body></html>""",
    "http://a.test/two": """<html><body><h1>two</h1>
        <p><a href="HTTP://A.TEST:80/">back-home</a></p></body></html>""",
    "http://b.test/three": """<html><body><h1>three</h1></body></html>""",
    "http://a.test/dir/sub/deep": """<html><body><h1>deep</h1></body></html>""",
}
SEEDS = ["HTTP://A.Test:80/"]


def test_relative_link_crawl_matches_sim(spark):
    pages_dict = {canonicalize_one(u): h.encode() for u, h in SITE.items()}
    sim = simulate_crawl(pages_dict, SEEDS, 4, default_budget=10)

    pages_df = spark.createDataFrame(
        [(u, h.encode()) for u, h in SITE.items()], "url string, html binary")
    lake = Lakehouse(tempfile.mkdtemp(prefix="lake_rel_"))
    seeds_df = spark.createDataFrame(
        [(1, SEEDS[0])], "seed_index long, url string")
    metrics = run_crawl(spark, lake, pages_df, seeds_df,
                        CrawlConfig(default_budget=10), 4)
    res = lake.read(spark, "results")
    got_waves = [
        [r.url_hash for r in res.filter(F.col("round") == k)
         .orderBy("fetch_order").collect()]
        for k in range(1, len(metrics) + 1)
    ]
    assert got_waves == sim.waves[: len(metrics)]
    assert {r.url_hash for r in lake.read(spark, "seen").collect()} == sim.seen
    # every page reachable only via relative links was actually fetched
    fetched_urls = {r.url for r in res.filter(F.col("status") == 200).collect()}
    assert fetched_urls == set(pages_dict)
    for r in res.filter(F.col("status") == 200).collect():
        assert r.text.encode() == sim.texts[r.url].encode()
    lake.destroy()