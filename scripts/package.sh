#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/multiomics_biocypher_kg_spark.zip
zip -qr dist/multiomics_biocypher_kg_spark.zip multiomics_biocypher_kg_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/multiomics_biocypher_kg_spark.zip"
