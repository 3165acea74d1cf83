"""Phase-level decomposition of the crawl round's core-invariant term.

VERDICT r4 #2: the T = S + W/c fit isolates S ≈ 45 s that does not shrink
with cores; this script locates WHICH phases make up S by running the
identical crawl job (same input, same config as the scaling campaign) at
two core counts with SPIDER_SPARK_PROFILE=1 and diffing the per-phase
times. A phase that shrinks ~c2/c1 is W (parallel work); a phase that
stays flat is S.

Usage: python scripts/profile_s.py [pages=100000] [seeds=50000] [weight=100]
       [cores_pairs="2,8"] [trials=1]
Env:   SCALE_TMPFS=1 SCALE_TASKSET=1 (same semantics as scaling_bench.py)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PROF_RE = re.compile(r"\[crawl-prof\] (.+): ([0-9.]+)s")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    weight = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    cores_list = [int(c) for c in
                  (sys.argv[4] if len(sys.argv) > 4 else "2,8").split(",")]
    trials = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from __spider_spark.session import get_spark
    from __spider_spark.sources.pages import generate_pages

    scratch = None
    if os.environ.get("SCALE_TMPFS") == "1":
        scratch = tempfile.mkdtemp(prefix="prof_s_", dir="/dev/shm")
        os.environ["SCALE_LOCAL_DIR"] = scratch
    pages_path = tempfile.mkdtemp(prefix="prof_pages_",
                                  dir=scratch) + "/pages"
    spark = get_spark(app_name="prof-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, n_pages, n_hosts=64, weight=weight).write.mode(
        "overwrite").parquet(pages_path)
    spark.stop()

    taskset_on = os.environ.get("SCALE_TASKSET") == "1"
    results: dict[int, dict[str, float]] = {}
    walls: dict[int, float] = {}
    for cores in cores_list:
        acc: dict[str, list[float]] = defaultdict(list)
        wall_acc = []
        for _t in range(trials):
            cmd = [sys.executable, str(REPO / "scripts/scaling_job.py"),
                   str(cores), pages_path, str(n_pages), str(n_seeds),
                   "1", "local"]
            if taskset_on:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
                cwd=str(REPO),
                env={**os.environ, "SPIDER_SPARK_PROFILE": "1",
                     "PYSPARK_PYTHON": sys.executable})
            per_label: dict[str, float] = defaultdict(float)
            for m in PROF_RE.finditer(out.stdout):
                per_label[m.group(1)] += float(m.group(2))
            for k, v in per_label.items():
                acc[k].append(v)
            job = json.loads(out.stdout.strip().splitlines()[-1])
            wall_acc.append(job["elapsed_sec"])
            print(f"  cores={cores} trial wall={job['elapsed_sec']}s "
                  f"thr={job['urls_per_sec']}/s", flush=True)
        results[cores] = {k: min(v) for k, v in acc.items()}
        walls[cores] = min(wall_acc)

    labels = sorted({k for r in results.values() for k in r},
                    key=lambda k: -results[cores_list[0]].get(k, 0))
    c1, c2 = cores_list[0], cores_list[-1]
    ratio_ideal = c1 / c2
    print(f"\nphase decomposition (min over {trials} trial(s); "
          f"ideal shrink ratio {ratio_ideal:.2f}):")
    print(f"{'phase':50s} {c1:>4d}c {c2:>6d}c  ratio  verdict")
    for k in labels:
        a = results[c1].get(k, 0.0)
        b = results[c2].get(k, 0.0)
        r = (b / a) if a else float("nan")
        verdict = ("PARALLEL" if r <= ratio_ideal * 1.7
                   else ("FLAT==S" if r >= 0.75 else "partial"))
        print(f"{k:50s} {a:6.2f} {b:6.2f}  {r:5.2f}  {verdict}")
    su = sum(results[c1].values())
    sv = sum(results[c2].values())
    print(f"{'(profiled total)':50s} {su:6.2f} {sv:6.2f}")
    print(f"{'(job wall)':50s} {walls[c1]:6.2f} {walls[c2]:6.2f}")
    if scratch:
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
