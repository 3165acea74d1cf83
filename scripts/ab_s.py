"""A/B harness for S-term levers: run the 8-core scaling job under a set
of conf variants (same input, interleaved), report walls per variant.

Usage: python scripts/ab_s.py [pages] [seeds] [weight] [cores] [trials]
Env:   SCALE_TMPFS=1 SCALE_TASKSET=1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import json as _json
_env_variants = os.environ.get("AB_VARIANTS")
VARIANTS: dict[str, str] = _json.loads(_env_variants) if _env_variants else {
    "base": "",
    "zstd": "spark.io.compression.codec=zstd",
    "arrow2k": "spark.sql.execution.arrow.maxRecordsPerBatch=2000",
    "pq_zstd": "spark.sql.parquet.compression.codec=zstd",
    "pq_lz4": "spark.sql.parquet.compression.codec=lz4",
    "zstd+arrow2k": ("spark.io.compression.codec=zstd;"
                     "spark.sql.execution.arrow.maxRecordsPerBatch=2000"),
}


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    weight = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    trials = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from __spider_spark.session import get_spark
    from __spider_spark.sources.pages import generate_pages

    scratch = None
    if os.environ.get("SCALE_TMPFS") == "1":
        scratch = tempfile.mkdtemp(prefix="ab_s_", dir="/dev/shm")
        os.environ["SCALE_LOCAL_DIR"] = scratch
    pages_path = tempfile.mkdtemp(prefix="ab_pages_", dir=scratch) + "/pages"
    spark = get_spark(app_name="ab-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, n_pages, n_hosts=64, weight=weight).write.mode(
        "overwrite").parquet(pages_path)
    spark.stop()

    taskset_on = os.environ.get("SCALE_TASKSET") == "1"
    walls: dict[str, list[float]] = defaultdict(list)
    for t in range(trials):
        for name, conf in VARIANTS.items():
            cmd = [sys.executable, str(REPO / "scripts/scaling_job.py"),
                   str(cores), pages_path, str(n_pages), str(n_seeds),
                   "1", "local"]
            if taskset_on:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
                cwd=str(REPO),
                env={**os.environ, "SPIDER_SPARK_CONF": conf,
                     "PYSPARK_PYTHON": sys.executable})
            job = json.loads(out.stdout.strip().splitlines()[-1])
            walls[name].append(job["elapsed_sec"])
            print(f"trial {t} {name:14s} wall={job['elapsed_sec']}s "
                  f"thr={job['urls_per_sec']}/s", flush=True)
    print("\nvariant results (min / all):")
    for name, ws in walls.items():
        print(f"  {name:14s} min={min(ws):7.2f}s  all={ws}")
    if scratch:
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
