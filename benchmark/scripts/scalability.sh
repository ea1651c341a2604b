#!/usr/bin/env bash
# Large-graph scalability sweep (reference benchmark/scripts/scalability.sh).
set -e
cd "$(dirname "$0")/../.."

for d in ogbn-arxiv flickr; do
  for r in 0.001 0.005 0.01 0.05 0.1; do
    echo "=== gcond $d r=$r ==="
    python -m graphslim_tpu.train_all -D "$d" -M gcond -R "$r" \
      --epochs 100 --eval_epochs 300 --run_eval 3 || echo "FAILED: $d r=$r"
  done
done
