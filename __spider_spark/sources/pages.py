"""Deterministic Common-Crawl-shaped pages table generator + seed list.

Fixture #1/#2 of FIXTURES.md. Stands in for the live web during simulated
fetch (the sandbox cannot make network calls; the reference's HTTP fetch
operators S5-S7, /root/reference/spiders/ctripSpider.py:221-225 and
YlSpiderMiddleware.py:63-124, are modeled as a join of the scheduled wave
against this table — SURVEY.md §2.1 S5).

Shape (BASELINE.json input_hint):
    url:string  warc_ts:timestamp  html:binary  text:string  lang:string

Determinism: every row is a pure function of (seed, row id) via blake2b —
NO global RNG, NO wall clock — so the table is identical at any parallelism
and regenerable on any cluster. Generation is distributed: ``spark.range``
→ ``mapInPandas`` (Arrow batches), so a 10^10-row page store is the same
code with a bigger ``n``.

Skew: host 0 holds ~50% of pages (FIXTURES.md §5 hot-host requirement);
remaining pages spread uniformly over ``n_hosts-1`` cold hosts. URLs are
emitted in deliberately messy pre-canonical form (mixed-case host, default
port, dot-segments, fragments, percent-encoded unreserved chars) so the
canonicalizer is exercised on every row: all four variants of page ``i``
canonicalize to exactly ``http://host{h}.test/p{i}``.

The golden ``text`` column is constructed independently of the extractor
(same contract, different code path) so extractor tests are not circular.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_EN_VOCAB = (
    "crawl frontier spark shuffle partition bloom filter politeness robots "
    "priority queue anti join window rank host budget wave extract parquet "
    "snapshot commit lineage metric scale skew salt hash canonical url page"
).split()
_ZH_VOCAB = "爬虫 队列 调度 去重 礼貌 机器人 优先 分区 哈希 规范 页面 链接 提取 文本 指纹 批次".split()
_ES_VOCAB = (
    "rastreo frontera cola prioridad enlace pagina texto extraer hash "
    "particion filtro presupuesto anfitrion onda confirmar linaje escala"
).split()
_LANG_VOCAB = {"en": _EN_VOCAB, "zh": _ZH_VOCAB, "es": _ES_VOCAB}

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(seed: int, i: int, salt: str) -> int:
    d = hashlib.blake2b(
        f"{seed}:{i}:{salt}".encode(), digest_size=8
    ).digest()
    return int.from_bytes(d, "big")


def host_of_page(i: int, n_hosts: int, seed: int = 42) -> int:
    """Host id for page i: ~50% land on hot host 0."""
    if _h(seed, i, "hot") % 2 == 0:
        return 0
    return 1 + _h(seed, i, "host") % max(1, n_hosts - 1)


def canonical_url(i: int, n_hosts: int, seed: int = 42) -> str:
    return f"http://host{host_of_page(i, n_hosts, seed)}.test/p{i}"


def raw_url(i: int, n_hosts: int, seed: int = 42) -> str:
    """Messy pre-canonical variant; canonicalize(raw_url) == canonical_url."""
    h = host_of_page(i, n_hosts, seed)
    v = _h(seed, i, "variant") % 4
    if v == 0:
        return f"HTTP://HOST{h}.TEST:80/p{i}"
    if v == 1:
        return f"http://Host{h}.test/a/../p{i}#frag"
    if v == 2:
        return f"http://host{h}.test/%70{i}"  # %70 == 'p' (unreserved)
    return f"http://host{h}.test/p{i}"


def outlink_ids(i: int, n: int) -> list[int]:
    """Deterministic 3-target outlink set for page i (self-links possible,
    dedup is the engine's job)."""
    return [(i * 31 + 7) % n, (i * 17 + 3) % n, (i + 1) % n]


def page_lang(i: int, seed: int = 42) -> str:
    r = _h(seed, i, "lang") % 10
    if r < 2:
        return "zh"
    if r < 3:
        return "es"
    return "en"


def _words(seed: int, i: int, salt: str, vocab: list[str], k: int) -> str:
    return " ".join(
        vocab[_h(seed, i, f"{salt}:{j}") % len(vocab)] for j in range(k)
    )


def build_page(i: int, n: int, n_hosts: int, seed: int = 42,
               weight: int = 1) -> dict:
    """Pure row constructor: (seed, i) -> full pages row.

    ``weight`` scales the paragraph count (weight 1 ≈ a stub page; 8-10 ≈ a
    realistic article) without touching any weight-1 byte — benchmarks use
    heavier pages so extraction compute, not scheduling overhead, dominates.
    """
    lang = page_lang(i, seed)
    vocab = _LANG_VOCAB[lang]
    title = _words(seed, i, "title", vocab, 3)
    h1 = _words(seed, i, "h1", vocab, 4)
    paras = [
        _words(seed, i, f"para{p}", vocab, 8 + _h(seed, i, f"plen{p}") % 9)
        for p in range((2 + _h(seed, i, "nparas") % 3) * weight)
    ]
    links = [(t, raw_url(t, n_hosts, seed)) for t in outlink_ids(i, n)]
    anchor_texts = [f"link to p{t}" for t, _ in links]
    # detail link is CONTENT (S6: the key is derived from the parsed page,
    # not synthesized); rel="detail" marks it as navigation, so extractors
    # keep it out of the frontier ``links``
    dhref = detail_href_of(i, n_hosts, seed)
    detail_anchor = (
        f'<p><a rel="detail" href="{dhref}">details</a></p>\n'
        if dhref is not None else ""
    )
    detail_text = ["details"] if dhref is not None else []
    # golden text: the extraction contract applied by construction
    text = "\n".join([h1, *paras, *anchor_texts, *detail_text])
    body_links = "\n".join(
        f'<p><a href="{u}">{a}</a></p>'
        for (t, u), a in zip(links, anchor_texts)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<html><head>\n"
        f"<title>{title}</title>\n"
        "<script>var seen = {}; function f(x) { return x < 1; }</script>\n"
        "<style>.wave { color: #000; }</style>\n"
        "</head>\n<body>\n"
        f"<h1>{h1}</h1>\n{body_paras}\n{body_links}\n{detail_anchor}"
        "</body></html>"
    )
    return {
        "url": raw_url(i, n_hosts, seed),
        "warc_ts": _EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def generate_pages(
    spark: SparkSession, n: int, n_hosts: int = 20, seed: int = 42,
    weight: int = 1,
) -> DataFrame:
    """Distributed deterministic pages table (spark.range → mapInPandas)."""

    def gen(batches):
        for pdf in batches:
            rows = [build_page(int(i), n, n_hosts, seed, weight)
                    for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    # explicit partitioning: bounded rows per task regardless of n
    parts = max(spark.sparkContext.defaultParallelism, n // 50_000 + 1)
    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def detail_variant(i: int, seed: int = 42) -> int:
    """How listing page i advertises its detail page in CONTENT:
    0 = relative href ("p{i}/detail"), 1 = absolute same-host href,
    2 = off-convention href with a query string (the case a synthesized
    suffix key would get WRONG — the join would 404), 3 = no detail link
    in the html at all (engine falls back to the /detail convention)."""
    r = _h(seed, i, "dvar") % 10
    if r < 6:
        return 0
    if r < 8:
        return 1
    if r < 9:
        return 2
    return 3


def detail_href_of(i: int, n_hosts: int, seed: int = 42) -> str | None:
    """The raw detail href as it appears in page i's html (None for
    variant 3 — page carries no detail link)."""
    v = detail_variant(i, seed)
    h = host_of_page(i, n_hosts, seed)
    if v == 0:
        return f"p{i}/detail"
    if v == 1:
        return f"http://host{h}.test/p{i}/detail"
    if v == 2:
        return f"/p{i}/detail?src=listing"
    return None


def detail_url_of(i: int, n_hosts: int, seed: int = 42) -> str:
    """Canonical detail-page URL for listing page i — what the content
    href resolves+canonicalizes to (variant 2 carries a query string, so
    it is NOT always the bare /detail suffix)."""
    base = canonical_url(i, n_hosts, seed)
    if detail_variant(i, seed) == 2:
        return base + "/detail?src=listing"
    return base + "/detail"


def has_detail(i: int, seed: int = 42) -> bool:
    """~1 in 8 listing pages has no detail page (404 enrichment path)."""
    return _h(seed, i, "hasdetail") % 8 != 0


def detail_cabins(i: int, seed: int = 42) -> list[tuple[str, float]]:
    """Deterministic cabin/price table for page i's detail page
    (reference analogue: the per-flight cabin list the second-stage fetch
    returns, /root/reference/spiders/ylSpider06.py:508-557)."""
    n_cab = 2 + _h(seed, i, "ncab") % 4
    out = []
    for c in range(n_cab):
        cabin = "FJYW"[_h(seed, i, f"cab{c}") % 4]
        price = round(80.0 + (_h(seed, i, f"price{c}") % 900_000) / 100.0, 2)
        out.append((cabin, price))
    return out


def build_detail_page(i: int, seed: int = 42) -> bytes | None:
    """Pure row constructor for the detail page of listing page i (None
    when the page has no detail — the engine must surface a 404 there)."""
    if not has_detail(i, seed):
        return None
    rows = "\n".join(
        f'<tr class="cabin"><td>{c}</td><td>{p:.2f}</td></tr>'
        for c, p in detail_cabins(i, seed)
    )
    html = (
        "<html><body>\n"
        f'<table id="cabins">\n{rows}\n</table>\n'
        "</body></html>"
    )
    return html.encode("utf-8")


def generate_detail_pages(
    spark: SparkSession, n: int, n_hosts: int = 20, seed: int = 42,
) -> DataFrame:
    """Distributed detail-pages table (url string, html binary): the
    second-stage fetch network (S6). Same determinism contract as
    :func:`generate_pages`."""

    def gen(batches):
        for pdf in batches:
            rows = [
                {"url": detail_url_of(int(i), n_hosts, seed),
                 "html": build_detail_page(int(i), seed)}
                for i in pdf["id"] if has_detail(int(i), seed)
            ]
            yield pd.DataFrame(rows, columns=["url", "html"])

    parts = max(spark.sparkContext.defaultParallelism, n // 50_000 + 1)
    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, schema="url string, html binary"
    )


def seed_urls(n: int, n_seeds: int, n_hosts: int = 20, seed: int = 42) -> list[str]:
    """Seed list: raw (messy) URLs of the first ``n_seeds`` page ids, in
    seed-file order — row identity = position, mirroring the reference's
    1-based line-number resume slicing (ctripSpider.py:131-134)."""
    return [raw_url(i, n_hosts, seed) for i in range(min(n_seeds, n))]


def seeds_df(spark: SparkSession, n: int, n_seeds: int, n_hosts: int = 20,
             seed: int = 42) -> DataFrame:
    """Seed relation with explicit seed_index (FIXTURES.md §2)."""
    rows = [(i + 1, u) for i, u in enumerate(seed_urls(n, n_seeds, n_hosts, seed))]
    return spark.createDataFrame(rows, "seed_index long, url string")
