"""Structured Streaming forms of the crawl engine's round semantics.

The engine's primary mode is batch rounds over lakehouse snapshots (chosen
deliberately for deterministic replay — SURVEY.md §2.9); this module gives
the same operators a streaming skin for continuous-ingest deployments:

  * ``windowed_fetch_metrics`` — the reference's hourly counters
    (/root/reference/start_spider_demo.sh:2-3, ctripSpider.py:234-250) as a
    watermarked tumbling-window aggregation (late fetch records are folded
    in until the watermark passes — the reference simply lost them);
  * ``stream_rounds_to_lakehouse`` — readStream → transform → foreachBatch
    atomic lakehouse commit, Trigger.AvailableNow for deterministic drains;
    each micro-batch id becomes a ``round`` (exactly the batch model, run
    by Spark's streaming engine instead of our driver loop);
  * ``dedup_stream`` — URL-seen semantics in-stream via ``dropDuplicates``
    on url_hash with a watermark bounding state (the streaming twin of the
    anti-join; state TTL mirrors the reference's Redis TTLs,
    get_ctrip_cookie.py:60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_hash_col, url_host
from ..sources.lakehouse import Lakehouse


def read_pages_stream(spark: SparkSession, src_dir: str,
                      schema: str) -> DataFrame:
    """File-source stream over a parquet directory (one file = one batch of
    arriving pages; at scale this is the Iceberg/Kafka ingest edge)."""
    return spark.readStream.schema(schema).parquet(src_dir)


def windowed_fetch_metrics(stream: DataFrame, ts_col: str = "warc_ts",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-host fetch counters with late-data handling."""
    return (
        stream.withColumn("host", url_host(F.col("url")))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("host"))
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("html")).alias("bytes_fetched"))
        .select(F.col("w.start").alias("window_start"), "host",
                "n_pages", "bytes_fetched")
    )


def dedup_stream(stream: DataFrame, ts_col: str = "warc_ts",
                 watermark: str = "2 hours") -> DataFrame:
    """In-stream URL-seen: canonicalize → hash → dedup with
    watermark-BOUNDED state.

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates`` on a
    business key never evicts its state unless the key includes the event
    -time column — on a 10^10-URL stream that is an unbounded state store
    (the bug this function shipped with until round 3). Within-watermark
    semantics (duplicates separated by more than the delay re-emit) are
    the right contract here: the durable dedup layer is the batch
    anti-join against the ``seen`` table; the stream op is the bounded
    front filter, exactly like the Bloom prefilter in the batch path."""
    keyed = (
        stream.withColumn("url_canonical", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash_col(F.col("url_canonical")))
        .withWatermark(ts_col, watermark)
    )
    return keyed.dropDuplicatesWithinWatermark(["url_hash"])


def content_dedup_stream(stream: DataFrame, text_col: str = "text",
                         ts_col: str = "warc_ts",
                         watermark: str = "2 hours") -> DataFrame:
    """In-stream exact CONTENT dedup: md5 fingerprint of the text with
    the same watermark-bounded state discipline — the streaming twin of
    operators/dedup.py:exact_dedup for continuous-ingest corpora."""
    keyed = (
        stream.withColumn("fingerprint", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
    )
    return keyed.dropDuplicatesWithinWatermark(["fingerprint"])


def stream_rounds_to_lakehouse(
    spark: SparkSession, src_dir: str, schema: str, lake: Lakehouse,
    checkpoint_dir: str, table: str = "stream_pages",
) -> None:
    """Drain the source with AvailableNow; each micro-batch commits
    atomically to the lakehouse with round = batch_id (restartable: the
    streaming checkpoint + idempotent lakehouse commit give exactly-once
    table contents)."""
    stream = dedup_stream(read_pages_stream(spark, src_dir, schema))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.commit(int(batch_id), append={table: batch_df})

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
