"""applyInPandasWithState: per-host budget holds across micro-batches."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from __spider_spark.streaming.stateful import politeness_rate_limit

SCHEMA = "host string, url string, url_hash long, priority double"


def test_rate_limit_state_crosses_batches(spark):
    src = tempfile.mkdtemp(prefix="state_src_")
    # 3 files -> 3 micro-batches; hostA gets 6+6+6 rows, budget 8:
    # admissions must be 6, then 2, then 0 (state remembered across batches)
    for b in range(3):
        rows = [("hostA", f"http://hostA/p{b}_{i}", b * 100 + i, 1.0 / (i + 1))
                for i in range(6)]
        rows += [("hostB", f"http://hostB/p{b}", 1000 + b, 0.5)]
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    # NB: file source may fold the three files into one batch; force
    # per-file batches
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out_dir = tempfile.mkdtemp(prefix="state_out_")
    q = (
        politeness_rate_limit(stream, budget=8)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_st_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    per_host = {r["host"]: r["n"] for r in
                got.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["hostA"] == 8          # budget enforced across batches
    assert per_host["hostB"] == 3          # under budget: all admitted
    seqs = sorted(r.admitted_seq for r in
                  got.filter(F.col("host") == "hostA").collect())
    assert seqs == list(range(1, 9))       # monotone admission sequence