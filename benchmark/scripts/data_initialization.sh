#!/usr/bin/env bash
# Condensation initializer ablation
# (reference benchmark/scripts/data_initialization.sh).
set -e
cd "$(dirname "$0")/../.."

METHODS=${METHODS:-"gcondx doscond gcond msgc"}
DATASETS=${DATASETS:-"cora"}
INITS=${INITS:-"random averaging kcenter herding"}
EXTRA=${EXTRA:-"--epochs 50 --eval_epochs 100 --run_eval 3"}

for m in $METHODS; do
  for d in $DATASETS; do
    for i in $INITS; do
      echo "=== $m $d init=$i ==="
      python -m graphslim_tpu.train_all -M "$m" -D "$d" --init "$i" $EXTRA \
        || echo "FAILED: $m $d $i"
    done
  done
done
