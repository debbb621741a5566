#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geotiff_tiler_spark.zip
zip -qr dist/geotiff_tiler_spark.zip geotiff_tiler_spark -x '*__pycache__*'
echo "dist/geotiff_tiler_spark.zip"
