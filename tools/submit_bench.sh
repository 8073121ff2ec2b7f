#!/usr/bin/env bash
# Ship the engine via spark-submit --py-files (the north-rule deployment
# path: the same zip + bench.py submits unchanged to a real cluster by
# swapping --master).
#
# Usage: tools/submit_bench.sh [extra spark-submit args...]
# Env:   SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_SF_DIR
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-8}"
ZIP=/tmp/lucene_spark_pkg.zip
rm -f "$ZIP"
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/lucene_spark_pkg.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("lucene_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged:", "/tmp/lucene_spark_pkg.zip")
EOF

exec spark-submit \
    --master "local[$CPUS]" \
    --py-files "$ZIP" \
    --conf spark.sql.shuffle.partitions="$CPUS" \
    "$@" \
    bench.py
