"""Pages generator + extractor: byte-identity invariant (BASELINE input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from __spider_spark.functions.text import (
    extract_links_one,
    extract_text,
    extract_text_one,
)
from __spider_spark.functions.urls import canonicalize_one
from __spider_spark.sources.pages import (
    build_page,
    canonical_url,
    generate_pages,
    outlink_ids,
    raw_url,
    seed_urls,
)

N, HOSTS = 300, 10


def test_raw_canonicalizes_to_canonical():
    for i in range(N):
        assert canonicalize_one(raw_url(i, HOSTS)) == canonical_url(i, HOSTS)


def test_extract_text_byte_identical_local():
    """extract_text(html) == golden text, byte-for-byte (utf-8)."""
    for i in range(N):
        row = build_page(i, N, HOSTS)
        got = extract_text_one(row["html"])
        assert got == row["text"], i
        assert got.encode("utf-8") == row["text"].encode("utf-8")


def test_extract_links_match_outlinks():
    for i in range(0, N, 17):
        row = build_page(i, N, HOSTS)
        links = extract_links_one(row["html"])
        want = [raw_url(t, HOSTS) for t in outlink_ids(i, N)]
        assert links == want


def test_generate_pages_distributed(spark):
    df = generate_pages(spark, N, HOSTS).cache()
    assert df.count() == N
    # byte-identity holds through Arrow batches + any partitioning
    bad = df.withColumn("x", extract_text(F.col("html"))).filter(
        F.col("x") != F.col("text")
    )
    assert bad.count() == 0
    # deterministic: same content regardless of partitioning
    df2 = generate_pages(spark, N, HOSTS).repartition(17)
    assert (
        df.select("url", "text").exceptAll(df2.select("url", "text")).count()
        == 0
    )
    # hot-host skew present (~50% on host0)
    from __spider_spark.functions.urls import url_host

    frac = (
        df.withColumn("h", url_host(F.col("url")))
        .filter(F.col("h") == "host0.test")
        .count()
    ) / N
    assert 0.35 < frac < 0.65
    df.unpersist()


def test_seed_urls_order_stable():
    s1 = seed_urls(N, 25, HOSTS)
    s2 = seed_urls(N, 25, HOSTS)
    assert s1 == s2 and len(s1) == 25
