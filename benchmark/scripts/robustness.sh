#!/usr/bin/env bash
# Robustness-under-attack sweep (reference benchmark/scripts, attack branch).
set -e
cd "$(dirname "$0")/../.."

for a in random_adj random_feat metattack; do
  for p in 0.1 0.25 0.5; do
    echo "=== gcond cora attack=$a ptb=$p ==="
    python -m graphslim_tpu.train_all -D cora -M gcond -A "$a" -P "$p" \
      --epochs 50 --eval_epochs 100 --run_eval 3 || echo "FAILED: $a $p"
  done
done
