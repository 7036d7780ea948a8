#!/usr/bin/env bash
# Package the engine and run a job via spark-submit --py-files — the
# deployment path of the north rule (a real cluster swaps --master).
#
#   scripts/submit.sh jobs/build_tiles.py --input /root/testdata/sf0.01 \
#       --zoom 12 --out /tmp/tiles_submit
#
# Extra spark-submit flags go in SPARK_SUBMIT_FLAGS (e.g. --master yarn).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="$1"; shift
ZIP="$(mktemp -d)/avecado_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'PY'
import os, sys, zipfile
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for root, _, files in os.walk("avecado_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        if f.endswith(".py"):
            p = os.path.join(root, f)
            zf.write(p, p)
zf.close()
PY
)
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
    --master "${SPARK_MASTER:-local[8]}" \
    ${SPARK_SUBMIT_FLAGS:-} \
    --py-files "$ZIP" \
    "$REPO/$JOB" "$@"
