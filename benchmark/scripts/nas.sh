#!/usr/bin/env bash
# Neural Architecture Search correlation sweep
# (reference benchmark/scripts/nas.sh).
# Run performance.sh first to materialize each method's reduced graph.
set -e
cd "$(dirname "$0")/../.."

METHODS=${METHODS:-"random kcenter gcondx doscond gcond msgc sfgc geom"}
DATASETS=${DATASETS:-"cora"}
EXTRA=${EXTRA:-"-V"}   # -V selects QUICK_SPACE; drop for the 480-arch space

for m in $METHODS; do
  for d in $DATASETS; do
    echo "=== nas $m $d ==="
    python benchmark/run_nas.py -M "$m" -D "$d" $EXTRA \
      || echo "FAILED: nas $m $d"
  done
done
