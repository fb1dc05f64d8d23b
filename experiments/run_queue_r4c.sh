#!/bin/bash
# Round-4 follow-on: a third fp32 seed so the precision-noise claim in
# BASELINE.md rests on >=3 seeds per precision (VERDICT r3 weak #2).
# Started by a waiter once run_queue_r4b.sh's process exits.
set -u
cd "$(dirname "$0")"

run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/usa_ckpt_$name"
  timeout 14400 python jax_train_usa.py --epochs 30 \
    --ckpt-dir "/tmp/usa_ckpt_$name" --out "jax_history_ep30_$name.json" \
    "$@" 2>&1 | tail -5
  echo "=== $name done $(date -u +%H:%M:%S) ==="
}

run fp32_seed44 --precision 32 --seed 44
echo "=== queue complete ==="
