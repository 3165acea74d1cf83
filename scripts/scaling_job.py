"""One scaling-bench job: run the crawl engine at a given parallelism.

Usage: python scripts/scaling_job.py <cores> <pages_parquet> <n_pages> <seeds> <rounds>
Prints one JSON line {cores, elapsed_sec, urls_fetched, urls_per_sec}.

This is the sandbox substitution for the north_rule's two-cluster-size
criterion (BASELINE.md): the same job, same input, at local[N] and local[4N].
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __spider_spark.plans.crawl import CrawlConfig, run_crawl  # noqa: E402
from __spider_spark.session import get_spark  # noqa: E402
from __spider_spark.sources.lakehouse import Lakehouse  # noqa: E402
from __spider_spark.sources.pages import seeds_df  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    n_pages = int(sys.argv[3])
    n_seeds = int(sys.argv[4])
    rounds = int(sys.argv[5])
    mode = sys.argv[6] if len(sys.argv) > 6 else "local"
    if mode == "cluster":
        # multi-JVM executors (local-cluster[n,cores,memMB]): each executor
        # is a separate JVM + its own Python workers — the faithful sandbox
        # analogue of N executors on a real cluster, and the control for the
        # single-JVM local[32] kernel-contention artifact (BENCH.md)
        exec_cores = int(os.environ.get("SCALE_EXEC_CORES", "4"))
        n_exec = max(cores // exec_cores, 1)
        master = f"local-cluster[{n_exec},{exec_cores},4096]"
        # ActiveProcessorCount: each executor JVM must size its GC/JIT
        # thread pools for ITS core allocation, not the whole box — without
        # it, 8 co-hosted executors each spawn ~23 GC threads and the
        # kernel thrashes (measured 5.5x on a pure-codegen probe; BENCH.md).
        # On real clusters YARN/K8s cgroups do this for you.
        extra = {"spark.executor.memory": "3g",
                 "spark.executor.extraJavaOptions":
                     f"-XX:ActiveProcessorCount={exec_cores}"}
    else:
        master = f"local[{cores}]"
        extra = {}
    # partitions == cores: oversubscribing (2x) measured pathological here —
    # concurrent commit jobs x partitions x Python workers thrash the box
    parts = int(os.environ.get("SCALE_PARTS", max(cores, 8)))
    # SCALE_LOCAL_DIR (e.g. /dev/shm/...): put shuffle/spill dirs AND the
    # lakehouse on tmpfs — removes the shared-virtio-disk confound from the
    # two-cluster-size measurement (each node of a real cluster brings its
    # own disks; this box has ONE, so disk-bound phases are flat in N by
    # construction — BENCH.md round-2 probe (c))
    scratch = os.environ.get("SCALE_LOCAL_DIR")
    if scratch:
        os.makedirs(scratch, exist_ok=True)
        extra["spark.local.dir"] = tempfile.mkdtemp(
            prefix=f"spark_local_{cores}_", dir=scratch)
    spark = get_spark(app_name=f"scaling-{cores}", master=master,
                      shuffle_partitions=parts, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    lake = Lakehouse(tempfile.mkdtemp(prefix=f"scale_lake_{cores}_",
                                      dir=scratch or None))
    cfg = CrawlConfig(default_budget=n_seeds, salt_buckets=16, bloom_parts=16)
    seeds = seeds_df(spark, n_pages, n_seeds, 64)
    t0 = time.perf_counter()
    metrics = run_crawl(spark, lake, pages, seeds, cfg, rounds)
    elapsed = time.perf_counter() - t0
    fetched = sum(m["wave"] for m in metrics)
    lake.destroy()
    print(json.dumps({
        "cores": cores, "elapsed_sec": round(elapsed, 2),
        "urls_fetched": fetched,
        "urls_per_sec": round(fetched / elapsed, 1),
    }))


if __name__ == "__main__":
    main()
