#!/usr/bin/env bash
# Package kgc for cluster submission:
#   scripts/package.sh && spark-submit --py-files dist/kgc.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       --conf spark.sql.execution.arrow.pyspark.enabled=true \
#       your_job.py
# The same kgc.pipeline entry point runs unchanged; on a real cluster
# point the StageStore root at an object-store path and swap the
# parquet writes for Iceberg `writeTo(...).append()`.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgc.zip
zip -qr dist/kgc.zip kgc -x 'kgc/__pycache__/*'
echo "dist/kgc.zip:"
unzip -l dist/kgc.zip | tail -3
