#!/usr/bin/env bash
# Run the env-gated Iceberg lifecycle contract test on a machine WITH
# network or a vendored iceberg-spark-runtime jar. This sandbox has
# neither (verified: no jar on the box, no route to maven central), so
# IcebergIndexCatalog's snapshot-swap semantics are validated by
# inspection + this recipe until a CI/cluster run executes it.
#
# The test (tests/test_catalog.py::test_iceberg_full_index_lifecycle)
# drives the FULL lifecycle against a real Iceberg catalog: build →
# search → remove (tombstones) → add (append segments) → coalesce
# (createOrReplace snapshot swap) → search parity with the parquet
# backend on identical inputs.
#
# Option A — vendored jar (air-gapped CI):
#   JAR=iceberg-spark-runtime-4.0_2.13-1.10.0.jar   # match pyspark minor
#   curl -LO "https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-4.0_2.13/1.10.0/$JAR"
#   SPARK_GRAFT_ICEBERG_JAR=$PWD/$JAR python -m pytest tests/test_catalog.py -q \
#       -k iceberg_full_index_lifecycle
#
# Option B — docker (hermetic):
#   docker run --rm -v "$PWD":/repo -w /repo apache/spark-py:latest \
#     bash -c 'pip install pytest numpy pandas pyarrow duckdb && \
#              curl -LO https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-4.0_2.13/1.10.0/iceberg-spark-runtime-4.0_2.13-1.10.0.jar && \
#              SPARK_GRAFT_ICEBERG_JAR=$PWD/iceberg-spark-runtime-4.0_2.13-1.10.0.jar \
#              python -m pytest tests/test_catalog.py -q -k iceberg_full_index_lifecycle'
set -euo pipefail
if [ -z "${SPARK_GRAFT_ICEBERG_JAR:-}" ] || [ ! -f "${SPARK_GRAFT_ICEBERG_JAR:-}" ]; then
  echo "SPARK_GRAFT_ICEBERG_JAR not set or missing; see header for how to fetch the jar" >&2
  exit 2
fi
exec python -m pytest tests/test_catalog.py -q -k iceberg_full_index_lifecycle
