#!/usr/bin/env bash
# Package csvweb_spark and launch the KG-construction job via
# spark-submit --py-files (north_rule deployment shape). On a real cluster
# change --master / add --deploy-mode cluster; nothing else changes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[8]}"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/kg_out}"
ZIP="$(mktemp -d)/csvweb_spark.zip"

cd "$REPO"
python -m zipfile -c "$ZIP" csvweb_spark

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/tools/submit_kg.py" --sf-dir "$SF_DIR" --out "$OUT"
