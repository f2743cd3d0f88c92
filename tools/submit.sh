#!/usr/bin/env bash
# spark-submit launcher: package osm_spark and run a job on a cluster
# (or local[N] in the sandbox). Usage:
#   tools/submit.sh [master] [job.py] [args...]
# Defaults: master=local[32], job=bench.py
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[${SPARK_GRAFT_CPUS:-32}]}"
JOB="${2:-$REPO/bench.py}"
shift $(( $# > 2 ? 2 : $# )) || true

ZIP="$(mktemp -d)/osm_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import os, sys, zipfile
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for root, _, files in os.walk("osm_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        if f.endswith(".py"):
            p = os.path.join(root, f)
            zf.write(p, p)
zf.close()
print("packaged", sys.argv[1])
EOF
)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$JOB" "$@"
