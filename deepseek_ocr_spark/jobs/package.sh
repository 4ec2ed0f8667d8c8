#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule deployment shape).
#
#   ./deepseek_ocr_spark/jobs/package.sh [outdir]
#   spark-submit --py-files <outdir>/deepseek_ocr_spark.zip \
#       deepseek_ocr_spark/jobs/run_extract.py --output ... [--input ...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
OUT="${1:-$REPO/dist}"
mkdir -p "$OUT"
cd "$REPO"
rm -f "$OUT/deepseek_ocr_spark.zip"
zip -qr "$OUT/deepseek_ocr_spark.zip" deepseek_ocr_spark -x '*__pycache__*' -x '*.pyc' -x '*/jobs/package.sh'
echo "$OUT/deepseek_ocr_spark.zip"
