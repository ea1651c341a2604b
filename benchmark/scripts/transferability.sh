#!/usr/bin/env bash
# Cross-architecture transferability sweep
# (reference benchmark/scripts/transferability.sh).
# Run performance.sh first to materialize each method's reduced graph.
set -e
cd "$(dirname "$0")/../.."

METHODS=${METHODS:-"random kcenter averaging vng gcondx doscond gcond msgc sgdd sfgc geom"}
DATASETS=${DATASETS:-"cora"}
EXTRA=${EXTRA:-""}

for m in $METHODS; do
  for d in $DATASETS; do
    echo "=== cross-arch $m $d ==="
    python benchmark/run_cross_arch.py -M "$m" -D "$d" $EXTRA \
      || echo "FAILED: cross-arch $m $d"
  done
done
