#!/bin/sh
# Package the library for spark-submit --py-files (the north-rule deployment
# shape). Usage: scripts/make_pyfiles_zip.sh [out.zip]
set -e
cd "$(dirname "$0")/.."
out="${1:-mashing_pumpkins_spark.zip}"
rm -f "$out"
zip -qr "$out" mashing_pumpkins_spark -x '*__pycache__*'
echo "wrote $out — run:"
echo "  spark-submit --py-files $out scripts/run_pipeline.py --pages ... --checkpoint-dir ... --output ..."
