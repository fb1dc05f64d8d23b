"""Whole-step attention cost: full train step with NATTEN vs without.

Re-measures the BASELINE.md train-step ablation rows on the current
(lane-packed) model to attribute the attention share of the step, for
cross-checking against the standalone per-site numbers in
experiments/na_block_ablation.py.

Usage: python experiments/attention_delta_step.py [--dropout 0.1]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def measure(attention, dropout, batch_size=32, hidden=32):
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import (
        create_train_state,
        make_train_step,
        strip_static,
    )

    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3, num_time=12, height=100, width=100,
        batch_size=batch_size, rng=rng,
    )
    batch = jax.device_put(batch)
    model = CultioNet(
        in_time=12,
        hidden_channels=hidden,
        dropout=dropout,
        attention_weights=attention,
        dilations=[1, 2],
    )
    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-2, weight_decay=1e-4
    )
    state = create_train_state(model, tx, batch, seed=0)
    step_fn = jax.jit(
        make_train_step(
            loss_name=LossTypes.TANIMOTO_COMBINED,
            precision="bf16",
            jit=False,
        )
    )
    key = jax.random.PRNGKey(0)
    for _ in range(5):
        key, sk = jax.random.split(key)
        state, logs = step_fn(state, strip_static(batch), sk)
    sync(logs["loss"])
    steps, best = 30, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sk = jax.random.split(key)
            state, logs = step_fn(state, strip_static(batch), sk)
        sync(logs["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dropout", type=float, default=0.1)
    args = ap.parse_args()

    out = {}
    out["natten"] = measure("natten", args.dropout)
    print("natten", out["natten"], flush=True)
    out["none"] = measure(None, args.dropout)
    print("none", out["none"], flush=True)
    out["attention_delta_ms"] = out["natten"] - out["none"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
