#!/bin/bash
# Round-4 re-runs: transformer_bf16 and bf16_seed43 crashed in the first
# queue because a concurrent `create` benchmark rewrote the chips
# directory mid-run (FileNotFoundError on a lazily-loaded chip / dataset
# count assertion). Nothing rewrites the chips now — strictly sequential.
set -u
cd "$(dirname "$0")"

run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  # the crashed first-queue attempt left partial checkpoints; a stale
  # last_store would auto-resume mid-OneCycle and corrupt the comparison
  rm -rf "/tmp/usa_ckpt_$name"
  timeout 14400 python jax_train_usa.py --epochs 30 \
    --ckpt-dir "/tmp/usa_ckpt_$name" --out "jax_history_ep30_$name.json" \
    "$@" 2>&1 | tail -5
  echo "=== $name done $(date -u +%H:%M:%S) ==="
}

run transformer_bf16 --temporal-encoder transformer --seed 42
run bf16_seed43 --seed 43
echo "=== queue complete ==="
