#!/usr/bin/env bash
# spark-submit --py-files deployment demo (north_rule). Builds the package
# zip, generates a small page store, and runs the crawl through spark-submit
# from a NEUTRAL cwd — proving the engine ships entirely via --py-files.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

ZIP="$(python - <<EOF
import sys; sys.path.insert(0, "$REPO")
from __spider_spark.session import _package_zip
print(_package_zip())
EOF
)"

python - <<EOF
import sys; sys.path.insert(0, "$REPO")
from __spider_spark.session import get_spark
from __spider_spark.sources.pages import generate_pages
s = get_spark(master="local[8]", app_name="gen")
s.sparkContext.setLogLevel("ERROR")
generate_pages(s, 20000, 64).write.parquet("$WORK/pages")
s.stop()
EOF

SPARK_SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
cd "$WORK"   # neutral cwd: nothing importable from here except --py-files
"$SPARK_SUBMIT" --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    --py-files "$ZIP" \
    "$REPO/main.py" \
    --pages-parquet "$WORK/pages" --n-pages 20000 --seeds 1000 \
    --rounds 2 --budget 50 --lake "$WORK/lake"
