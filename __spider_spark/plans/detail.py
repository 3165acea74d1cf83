"""Keyed second-stage detail fetch (SURVEY.md §2.1 S6, full form).

The reference's listing callback derives a *detail* URL per parsed row,
fetches it, parses a different schema out of the response, and merges the
cheapest cabin back onto the listing row
(/root/reference/spiders/ylSpider06.py:508-510, 544-557). Scrapy does this
as a per-row callback chain; the Spark-native form is one keyed join:

    listing rows ──derive detail key──▶ ⋈ detail index ──extract──▶ argmin

Scale shape: the left side is one round's fetched wave (bounded by the
politeness budget — small); the right side is the detail page store (big).
Like the listing fetch, the detail index is hash-partitioned on its join
key once per crawl, so each round only shuffles the wave side. The argmin
enrichment is pure Column exprs (``array_sort`` over ``struct(price,
cabin)``) — no second shuffle, no Python beyond the Arrow-batched parse.

A missing detail page is a first-class outcome (``detail_status`` 404,
null enrichment), mirroring the listing path's sentinel handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.detail import extract_detail
from ..functions.urls import canonicalize_url, resolve_link, url_hash_col

DETAIL_SUFFIX = "/detail"


def detail_index(detail_pages: DataFrame) -> DataFrame:
    """(detail_hash, html) fetchable index of the detail-page store."""
    return detail_pages.select(
        url_hash_col(canonicalize_url(F.col("url"))).alias("detail_hash"),
        F.col("html"),
    )


def _suffix_detail_url(url):
    """Convention fallback: insert DETAIL_SUFFIX as a path segment. For a
    canonical URL carrying a query string the suffix goes BEFORE the '?'
    (a raw concat would bury it inside the query and produce a
    semantically malformed key). Pure Column expr."""
    pos = F.locate("?", url)
    return F.when(
        pos > 0,
        F.concat(F.substring(url, F.lit(1), pos - 1),
                 F.lit(DETAIL_SUFFIX),
                 F.substring(url, pos, F.length(url))),
    ).otherwise(F.concat(url, F.lit(DETAIL_SUFFIX)))


def derive_detail_key(listing: DataFrame) -> DataFrame:
    """Listing row -> (url_hash, url, detail_url, detail_hash).

    The key is CONTENT-DERIVED when the parsed page advertises one (the
    reference derives the detail URL from parsed row fields,
    /root/reference/spiders/ylSpider06.py:508-510): a ``detail_href``
    column (the page's rel="detail" anchor) is resolved against the
    listing URL and canonicalized — an off-convention href (query string,
    different path shape) yields the RIGHT key where a synthesized suffix
    would 404. Rows without a content href (or inputs without the column)
    fall back to the ``/detail`` suffix convention, inserted query-aware
    by :func:`_suffix_detail_url`."""
    fallback = _suffix_detail_url(F.col("url"))
    if "detail_href" in listing.columns:
        detail_url = F.coalesce(
            canonicalize_url(
                resolve_link(F.col("url"), F.col("detail_href"))),
            fallback,
        )
    else:
        detail_url = fallback
    return (
        listing.select("url_hash", "url",
                       detail_url.alias("detail_url"))
        .withColumn("detail_hash", url_hash_col(F.col("detail_url")))
    )


def fetch_details(listing: DataFrame, detail_idx: DataFrame) -> DataFrame:
    """Second-stage fetch + extract + argmin enrichment.

    Input: fetched listing rows (status 200) with ``url``/``url_hash``.
    Output: one row per listing row —
      (url_hash, url, detail_url, detail_status, cabins, min_cabin,
       min_price) — keyed by ``url_hash`` so the caller can merge it onto
    any listing-keyed table (J7's min-price index, the results sink, ...).
    """
    fetched = derive_detail_key(listing).join(
        detail_idx, "detail_hash", "left")
    # F.get is null-safe on empty/null arrays (ANSI element_at would throw)
    best = F.get(
        F.array_sort(F.transform(
            "cabins",
            lambda c: F.struct(c["price"].alias("price"),
                               c["cabin"].alias("cabin")))),
        0,
    )
    return (
        fetched
        .withColumn(
            "detail_status",
            F.when(F.col("html").isNull(), F.lit(404)).otherwise(F.lit(200)))
        .withColumn("cabins", extract_detail(F.col("html")))
        .withColumn("min_cabin", best["cabin"])
        .withColumn("min_price", best["price"])
        .select("url_hash", "url", "detail_url", "detail_status",
                "cabins", "min_cabin", "min_price")
    )
