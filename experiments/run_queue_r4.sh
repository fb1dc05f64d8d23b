#!/bin/bash
# Round-4 TPU accuracy-run queue (one chip -> strictly sequential).
# VERDICT r3 #1: TemporalTransformer trained to convergence (bf16 + fp32).
# VERDICT r3 #5: two more conv bf16 seeds for the trajectory-noise band.
# All runs use the matched 30-epoch recipe of BASELINE.md (hidden=32,
# natten, TanimotoComplement, AdamW 0.01 OneCycle, batch 8 x accum 2,
# every-5th val split, augment off).
set -u
cd "$(dirname "$0")"

run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout 14400 python jax_train_usa.py --epochs 30 \
    --ckpt-dir "/tmp/usa_ckpt_$name" --out "jax_history_ep30_$name.json" \
    "$@" 2>&1 | tail -5
  echo "=== $name done $(date -u +%H:%M:%S) ==="
}

run transformer_bf16 --temporal-encoder transformer --seed 42
run bf16_seed43 --seed 43
run bf16_seed44 --seed 44
run transformer_fp32 --temporal-encoder transformer --seed 42 \
  --precision 32
echo "=== queue complete ==="
