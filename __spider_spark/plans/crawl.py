"""Round-based crawl driver: frontier → seen-anti-join → robots → politeness
→ fetch → extract → discover → atomic commit.

This is the Spark-native re-expression of the reference's whole crawl loop
(SURVEY.md §3.1): ``start_requests`` frontier generation
(/root/reference/spiders/ctripSpider.py:117-229), scheduler throttling
(settings.py:32-41), download + sentinel errors
(YlSpiderMiddleware.py:186-195), parse callbacks (ctripSpider.py:231-332)
and the batch sink (YlTwistPipeline.py:153-176) — as ONE declarative
DataFrame DAG per scheduling round, committed atomically to the lakehouse.

Batch rounds (not Structured Streaming) were chosen deliberately: the
reference is batch-per-``task_time`` (start_spider_demo.sh:2-11) and rounds
give deterministic replay + trivial restart equivalence (SURVEY.md §2.9).

Determinism contract (north_rule "matching crawl ordering"):
  * wave selection is a pure function of (round, priority, url_hash) —
    politeness clip orders by (priority DESC, url_hash ASC) per host;
  * ``fetch_order`` is a total order within the round by the same key;
  * frontier merges resolve duplicates by a fixed rule:
    (priority DESC, round ASC, parent_url ASC NULLS FIRST);
  * nothing reads wall-clock or partition iteration order; lineage columns
    (partition_id) are provenance, excluded from equivalence comparison.

Scale notes (the 100 TB / 10^10-URL case):
  * scheduling never touches ``html`` — the fetch join reads it only for
    the politeness-clipped wave (column-pruning discipline, SURVEY.md §4);
  * every join/agg keys on ``url_hash`` (long), never on url strings;
  * the hot-host frontier skew is neutralized in the politeness clip
    (salted two-phase top-k), and the seen anti-join is Bloom-prefiltered;
  * on a real cluster the pages store and seen table are bucketed by
    ``url_hash`` so the fetch join and anti-join co-locate without a
    full shuffle of the big side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import extract_links, extract_text
from ..functions.urls import canonicalize_url, url_hash_col, url_host
from ..operators.politeness import clip_wave
from ..operators.robots import robots_allowed_udf
from ..operators.seen import (
    bloom_maybe_seen_udf,
    build_partitioned_bloom,
    filter_unseen,
)
from ..sources.lakehouse import Lakehouse

FRONTIER_COLS = ["url", "url_hash", "host", "priority", "round",
                 "parent_url", "seed_index"]


@dataclass
class CrawlConfig:
    default_budget: int = 4
    budgets: dict[str, int] = field(default_factory=dict)  # host -> budget
    robots: dict[str, str] = field(default_factory=dict)   # host -> robots.txt
    priority_decay: float = 0.5
    salt_buckets: int = 8
    use_bloom: bool = True
    bloom_parts: int = 8
    bloom_bits_per_part: int = 1 << 18
    bloom_hashes: int = 7


def _dedup_frontier(df: DataFrame) -> DataFrame:
    """Deterministic duplicate resolution on url_hash:
    keep (priority DESC, round ASC, parent_url ASC NULLS FIRST)."""
    w = Window.partitionBy("url_hash").orderBy(
        F.col("priority").desc(),
        F.col("round").asc(),
        F.col("parent_url").asc_nulls_first(),
        F.col("seed_index").asc_nulls_first(),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def init_crawl(spark: SparkSession, lake: Lakehouse, seeds: DataFrame,
               cfg: CrawlConfig) -> None:
    """Round-0 commit: canonicalized, deduped seed frontier.

    Reference analogue: seed scan + line-slice + canonicalize
    (ctripSpider.py:125-146); seed_index mirrors the 1-based line number
    used for resume sharding (ctripSpider.py:131-134)."""
    frontier = (
        seeds.filter(F.col("url").isNotNull() & (F.trim(F.col("url")) != ""))
        .withColumn("url", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash_col(F.col("url")))
        .withColumn("host", url_host(F.col("url")))
        .withColumn("priority", F.lit(1.0))
        .withColumn("round", F.lit(1))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .select(*FRONTIER_COLS)
    )
    lake.commit(0, replace={"frontier": _dedup_frontier(frontier)})


def _budgets_df(spark: SparkSession, cfg: CrawlConfig) -> DataFrame | None:
    if not cfg.budgets:
        return None
    return spark.createDataFrame(
        list(cfg.budgets.items()), "host string, budget int"
    )


def pages_index(pages: DataFrame) -> DataFrame:
    """Fetchable index of the page store: (url_hash, html) keyed by the
    canonical URL. Stands in for the network (SURVEY.md §2.1 S5); reads
    only the columns fetching needs."""
    return pages.select(
        url_hash_col(canonicalize_url(F.col("url"))).alias("url_hash"),
        F.col("html"),
    )


def run_round(spark: SparkSession, lake: Lakehouse, pages_idx: DataFrame,
              cfg: CrawlConfig) -> dict:
    """Execute one scheduling round; returns the committed metrics row."""
    k = lake.latest_round() + 1
    frontier = lake.read(spark, "frontier")
    seen = lake.read(spark, "seen")

    # 1. candidates = frontier ∖ seen (Bloom-prefiltered anti-join, J6)
    bloom_udf = None
    if cfg.use_bloom and seen is not None:
        parts = build_partitioned_bloom(
            seen, cfg.bloom_parts, cfg.bloom_bits_per_part, cfg.bloom_hashes)
        bloom_udf = bloom_maybe_seen_udf(
            spark, parts, cfg.bloom_parts, cfg.bloom_bits_per_part,
            cfg.bloom_hashes)
    candidates = filter_unseen(frontier, seen, bloom_udf)

    # 2. robots gate (reference disables this, settings.py:21; we don't)
    allowed_udf = robots_allowed_udf(spark, cfg.robots)
    with_path = candidates.withColumn(
        "__path", F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    )
    allowed = with_path.filter(allowed_udf(F.col("host"), F.col("__path"))) \
                       .drop("__path")
    blocked = with_path.filter(~allowed_udf(F.col("host"), F.col("__path"))) \
                       .drop("__path")

    # 3. politeness clip → this round's wave, with a deterministic total
    #    fetch order (O3 invariant)
    wave = clip_wave(allowed, _budgets_df(spark, cfg), cfg.default_budget,
                     cfg.salt_buckets)
    wave = wave.withColumn(
        "fetch_order",
        F.row_number().over(
            Window.orderBy(F.col("priority").desc(), F.col("url_hash").asc())
        ),
    ).cache()

    # 4. simulated fetch: wave ⋈ pages (url_hash). Missing page -> 404
    #    (the reference's sentinel response, YlSpiderMiddleware.py:186-195,
    #    becomes a status/error column, never a magic URL)
    fetched = (
        wave.join(pages_idx, "url_hash", "left")
        .withColumn("status",
                    F.when(F.col("html").isNotNull(), F.lit(200))
                     .otherwise(F.lit(404)))
    )

    # 5. extract text + outlinks (vectorized; html read exactly once)
    extracted = fetched.withColumn(
        "text", F.when(F.col("status") == 200, extract_text(F.col("html")))
    ).withColumn(
        "links", F.when(F.col("status") == 200, extract_links(F.col("html")))
    ).drop("html").cache()

    results = extracted.select(
        "url", "url_hash", "host",
        F.lit(k).alias("round"), "fetch_order", "status", "text",
        F.struct(
            F.col("parent_url"),
            F.spark_partition_id().alias("partition_id"),
            F.col("seed_index"),
        ).alias("lineage"),
    )

    # 6. discover outlinks → next-round frontier entries
    discovered = (
        extracted.filter(F.col("status") == 200)
        .select(
            F.explode("links").alias("raw_link"),
            F.col("priority").alias("parent_priority"),
            F.col("url").alias("parent_url"),
            F.col("seed_index"),
        )
        .withColumn("url", canonicalize_url(F.col("raw_link")))
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        .withColumn("url_hash", url_hash_col(F.col("url")))
        .withColumn("host", url_host(F.col("url")))
        .withColumn("priority",
                    F.col("parent_priority") * F.lit(cfg.priority_decay))
        .withColumn("round", F.lit(k + 1))
        .select(*FRONTIER_COLS)
    )

    # 7. state transition: everything waved or robots-blocked is now seen;
    #    frontier' = (frontier ∖ newly_seen ∖ seen) ∪ discovered, deduped
    newly_seen = (
        wave.select("url_hash", "url").withColumn("outcome", F.lit("fetched"))
        .unionByName(
            blocked.select("url_hash", "url")
            .withColumn("outcome", F.lit("robots_blocked"))
        )
        .withColumn("round_seen", F.lit(k))
    )
    seen_next_keys = newly_seen.select("url_hash")
    if seen is not None:
        seen_next_keys = seen_next_keys.unionByName(seen.select("url_hash"))
    new_frontier = _dedup_frontier(
        frontier.unionByName(discovered)
        .join(seen_next_keys, "url_hash", "left_anti")
    )

    # 8. metrics (reference analogue: running counters A1,
    #    ctripSpider.py:51,234-250; at scale these become observe()/
    #    accumulators — here explicit counts on the cached wave)
    n_wave = wave.count()
    n_ok = extracted.filter(F.col("status") == 200).count()
    n_blocked = blocked.count()
    n_discovered = discovered.select("url_hash").distinct().count()
    metrics_row = {
        "round": k, "wave": n_wave, "fetched_200": n_ok,
        "fetched_404": n_wave - n_ok, "robots_blocked": n_blocked,
        "discovered": n_discovered,
    }
    metrics = spark.createDataFrame(
        [metrics_row],
        "round int, wave long, fetched_200 long, fetched_404 long, "
        "robots_blocked long, discovered long",
    )

    lake.commit(
        k,
        append={"seen": newly_seen, "results": results, "metrics": metrics},
        replace={"frontier": new_frontier},
    )
    wave.unpersist()
    extracted.unpersist()
    return metrics_row


def run_crawl(spark: SparkSession, lake: Lakehouse, pages: DataFrame,
              seeds: DataFrame, cfg: CrawlConfig, n_rounds: int) -> list[dict]:
    """Run/resume a crawl for up to n_rounds (idempotent across restarts:
    picks up from the last committed snapshot — SURVEY.md §2.9 resume)."""
    if lake.latest_round() < 0:
        init_crawl(spark, lake, seeds, cfg)
    idx = pages_index(pages).cache()
    out = []
    while lake.latest_round() < n_rounds:
        frontier = lake.read(spark, "frontier")
        if frontier is None or frontier.limit(1).count() == 0:
            break
        out.append(run_round(spark, lake, idx, cfg))
    idx.unpersist()
    return out
