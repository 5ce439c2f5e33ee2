#!/bin/bash
# Cluster deployment recipe for the two-cluster-size scaling evidence
# (north rule: the identical job at N and 4N executors, throughput
# scaling efficiency >= 0.8 between them).
#
# On a real cluster:  MASTER=yarn (or k8s://...) N=250 ./tools/submit_scaling.sh
#   -> two spark-submit runs, N and 4N executor instances, same input,
#      same engine zip; per-stage lineage rows (doc/failure counts,
#      partition ids, wall) land next to each output for the
#      efficiency calculation.
# In this sandbox (no multi-node master): MASTER defaults to local[cores],
#   which is exactly the protocol bench.py automates with calibrated
#   window evidence — this script is the deployment-shaped version.
set -euo pipefail
cd "$(dirname "$0")/.."

N=${N:-4}
INPUT=${INPUT:?set INPUT=<pages parquet/iceberg path>}
OUTPUT=${OUTPUT:?set OUTPUT=<output dir>}
SUBMIT=${SUBMIT:-spark-submit}

mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip ocrd_tesserocr_spark -x '*__pycache__*'

for EX in "$N" "$((4 * N))"; do
  t0=$(date +%s)
  "$SUBMIT" \
    --master "${MASTER:-local[$EX]}" \
    --conf spark.executor.instances="$EX" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.shuffle.partitions="$((2 * EX))" \
    --py-files dist/engine.zip \
    tools/submit_entry.py \
    extract --preset extract --partitions "$((8 * EX))" \
    --input "$INPUT" --output "$OUTPUT/ex$EX"
  echo "executors=$EX wall_sec=$(($(date +%s) - t0))"
done

echo "efficiency = (docs/sec at 4N) / (4 x docs/sec at N); target >= 0.8"
echo "per-run doc counts are in each output's lineage rows"
