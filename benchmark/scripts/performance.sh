#!/usr/bin/env bash
# Method × dataset × rate sweep (reference benchmark/scripts/performance.sh).
# Datasets fall back to deterministic synthetic twins when no --load_path
# with real files is given.
set -e
cd "$(dirname "$0")/../.."

METHODS=${METHODS:-"random kcenter herding cent_d cent_p averaging clustering vng variation_neighborhoods gcond doscond gcondx doscondx gcdm sgdd msgc sfgc geom gcsntk simgc gdem gecc"}
DATASET=${DATASET:-cora}
RATES=${RATES:-"0.1 0.25 0.5"}
EXTRA=${EXTRA:-"--epochs 50 --eval_epochs 100 --run_eval 3"}

for m in $METHODS; do
  for r in $RATES; do
    echo "=== $m $DATASET r=$r ==="
    python -m graphslim_tpu.train_all -D "$DATASET" -M "$m" -R "$r" $EXTRA || echo "FAILED: $m r=$r"
  done
done
