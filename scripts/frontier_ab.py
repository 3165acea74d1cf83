"""A/B the frontier storage strategy at the mature-crawl shape.

The merge-on-read frontier's claim is write-cost, not read-cost: a mature
crawl has frontier >> wave (BASELINE.json: 10^10-URL frontier vs
budget-bounded waves), and copy-on-write rewrites the whole frontier
every round. This script builds that shape deliberately — a large seed
frontier with a small per-host budget — and runs the identical crawl in
cow and mor modes on the same input, reporting per-round wall and the
commit-phase seconds.

Usage: python scripts/frontier_ab.py [pages=300000] [seeds=200000]
       [budget=100] [rounds=4] [weight=10]
Env:   SCALE_TMPFS=1 (stage everything on /dev/shm)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PROF_RE = re.compile(r"\[crawl-prof\] (.+): ([0-9.]+)s")

JOB = """
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from __spider_spark.plans.crawl import CrawlConfig, run_crawl, build_pages_index
from __spider_spark.session import get_spark
from __spider_spark.sources.lakehouse import Lakehouse
from __spider_spark.sources.pages import seeds_df

mode = sys.argv[1]
spark = get_spark(app_name="frontier-ab-" + mode, master="local[8]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages_path!r})
lake = Lakehouse(tempfile.mkdtemp(prefix="fab_" + mode + "_",
                                  dir={scratch!r} or None))
cfg = CrawlConfig(default_budget={budget}, salt_buckets=16,
                  curate=True, frontier_mode=mode)
seeds = seeds_df(spark, {pages}, {seeds}, 64)
idx = build_pages_index(spark, pages)
idx.count()
t0 = time.perf_counter()
m = run_crawl(spark, lake, pages, seeds, cfg, {rounds}, pages_idx=idx)
el = time.perf_counter() - t0
fetched = sum(r["wave"] for r in m)
print(json.dumps({{"mode": mode, "elapsed": round(el, 2),
                   "fetched": fetched,
                   "thr": round(fetched / el, 1)}}))
lake.destroy()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    weight = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    from __spider_spark.session import get_spark
    from __spider_spark.sources.pages import generate_pages

    scratch = ""
    if os.environ.get("SCALE_TMPFS") == "1":
        scratch = tempfile.mkdtemp(prefix="fab_", dir="/dev/shm")
    pages_path = tempfile.mkdtemp(prefix="fab_pages_",
                                  dir=scratch or None) + "/pages"
    spark = get_spark(app_name="fab-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, n_pages, n_hosts=64, weight=weight).write.mode(
        "overwrite").parquet(pages_path)
    spark.stop()

    job = JOB.format(repo=str(REPO), pages_path=pages_path, scratch=scratch,
                     budget=budget, pages=n_pages, seeds=n_seeds,
                     rounds=rounds)
    jf = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    jf.write(job)
    jf.close()

    for trial in range(2):
        for mode in ("cow", "mor"):
            out = subprocess.run(
                [sys.executable, jf.name, mode],
                capture_output=True, text=True, check=True, cwd=str(REPO),
                env={**os.environ, "SPIDER_SPARK_PROFILE": "1",
                     "PYSPARK_PYTHON": sys.executable})
            phases: dict[str, float] = {}
            for m in PROF_RE.finditer(out.stdout):
                phases[m.group(1)] = phases.get(m.group(1), 0.0) \
                    + float(m.group(2))
            line = out.stdout.strip().splitlines()[-1]
            commit = phases.get("commit (5 table writes)", 0.0)
            print(f"trial {trial} {mode}: {line}  "
                  f"commit_phase={commit:.2f}s  "
                  f"read_state={phases.get('read state', 0):.2f}s",
                  flush=True)
    os.unlink(jf.name)
    if scratch:
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
