#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (pure-Python package, no deps).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_application_spark.zip
zip -qr dist/ocr_application_spark.zip ocr_application_spark -x '*__pycache__*'
echo "dist/ocr_application_spark.zip"
