#!/usr/bin/env bash
# Package the engine and launch the index+search job via spark-submit.
# Usage: scripts/submit.sh <master> <corpus.parquet> <index_root> <queries.tsv> <out.tsv> [k]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
CORPUS="$2"; INDEX_ROOT="$3"; QUERIES="$4"; OUT="$5"; K="${6:-10}"

ZIP="$(mktemp -d)/colbert_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" colbert_spark -x '*__pycache__*')

spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/scripts/job_index_and_search.py" \
  --corpus "$CORPUS" --index-root "$INDEX_ROOT" \
  --queries "$QUERIES" --k "$K" --output "$OUT" --overwrite force_silent_overwrite
