"""Structured Streaming forms: windowed metrics, in-stream dedup, lakehouse sink."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from __spider_spark.sources.lakehouse import Lakehouse
from __spider_spark.sources.pages import PAGES_SCHEMA, generate_pages
from __spider_spark.streaming.rounds import (
    dedup_stream,
    read_pages_stream,
    stream_rounds_to_lakehouse,
    windowed_fetch_metrics,
)

N, HOSTS = 300, 8


def _src(spark):
    d = tempfile.mkdtemp(prefix="stream_src_")
    pages = generate_pages(spark, N, HOSTS)
    # two files -> two micro-batches under AvailableNow
    pages.filter(F.col("warc_ts") < "2024-01-01 00:02:30") \
        .coalesce(1).write.mode("append").parquet(d)
    pages.filter(F.col("warc_ts") >= "2024-01-01 00:02:30") \
        .coalesce(1).write.mode("append").parquet(d)
    return d


def test_windowed_metrics_match_batch(spark):
    d = _src(spark)
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    stream = read_pages_stream(spark, d, PAGES_SCHEMA)
    q = (
        # data spans 00:00-00:05; a 30s watermark closes (and emits) the
        # first ~4 windows in append mode
        windowed_fetch_metrics(stream, window="1 minute", watermark="30 seconds")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    batch = (
        generate_pages(spark, N, HOSTS)
        .withColumn("host", F.expr("lower(parse_url(url, 'HOST'))"))
        .groupBy(F.window("warc_ts", "1 minute").alias("w"), "host")
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("html")).alias("bytes_fetched"))
        .select(F.col("w.start").alias("window_start"), "host",
                "n_pages", "bytes_fetched")
    )
    # append mode only emits windows the watermark has passed; every emitted
    # row must match the batch computation exactly
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_stream_dedup_and_lakehouse_sink(spark):
    d = _src(spark)
    lake = Lakehouse(tempfile.mkdtemp(prefix="stream_lake_"))
    stream_rounds_to_lakehouse(
        spark, d, PAGES_SCHEMA, lake,
        checkpoint_dir=tempfile.mkdtemp(prefix="ckpt2_"))
    tbl = lake.read(spark, "stream_pages")
    assert tbl is not None
    # every generated page is unique post-canonicalization -> all survive
    assert tbl.count() == N
    assert tbl.select("url_hash").distinct().count() == N
    # dedup actually dedups: same source again through a fresh pipeline
    # with a duplicated file
    import os
    import shutil
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    shutil.copy(f"{d}/{files[0]}", f"{d}/dup-{files[0]}")
    assert spark.read.parquet(d).count() > N  # source now has duplicates
    lake2 = Lakehouse(tempfile.mkdtemp(prefix="stream_lake2_"))
    stream_rounds_to_lakehouse(
        spark, d, PAGES_SCHEMA, lake2,
        checkpoint_dir=tempfile.mkdtemp(prefix="ckpt3_"))
    assert lake2.read(spark, "stream_pages") \
        .select("url_hash").distinct().count() == N
    lake.destroy()
    lake2.destroy()

def test_content_dedup_stream_bounded_state(spark, tmp_path):
    """Exact content dedup in-stream: same text under different URLs
    collapses to one row across micro-batches (within the watermark),
    distinct texts all survive."""
    import datetime as dt

    from __spider_spark.streaming.rounds import content_dedup_stream
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "url string, warc_ts timestamp, text string"
    d = tmp_path / "in"
    d.mkdir()
    spark.createDataFrame(
        [("http://a.test/1", t0, "alpha body"),
         ("http://a.test/2", t0, "beta body")], schema,
    ).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(
        [("http://b.test/9", t0 + dt.timedelta(minutes=5), "alpha body"),
         ("http://b.test/3", t0 + dt.timedelta(minutes=6), "gamma body")],
        schema,
    ).coalesce(1).write.parquet(str(d / "f2"))
    stream = spark.readStream.schema(schema).parquet(str(d / "f*"))
    q = (content_dedup_stream(stream, watermark="1 hour")
         .writeStream.format("memory").queryName("cds")
         .outputMode("append").start())
    q.processAllAvailable()
    rows = spark.sql("select text, count(*) n from cds group by text") \
        .collect()
    q.stop()
    got = {r.text: r.n for r in rows}
    assert got == {"alpha body": 1, "beta body": 1, "gamma body": 1}
