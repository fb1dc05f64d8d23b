"""Split the in-model attention cost: Pallas kernel vs sandwich plumbing.

attention_delta_step.py established the TRUSTED total (whole-step delta,
natten vs attention_weights=None): ~28 ms at h=32. This splits it by a
third whole-step variant where the NA *kernel* is replaced by identity
(out = v) while the LayerNorm sandwich, fused QKV projection, output
projection, and dropout stay in place:

  kernel_cost   = step(full) - step(kernel->identity)
  plumbing_cost = step(kernel->identity) - step(attention None)

If plumbing is a large share, a fused LN+QKV+NA+proj banded kernel is the
next perf lever; if the kernel dominates, it is not.

Usage: python experiments/na_sandwich_split.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def sync(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def time_step(step_fn, state, batch, steps=30, reps=3):
    key = jax.random.PRNGKey(0)
    for _ in range(5):
        key, subkey = jax.random.split(key)
        state, logs = step_fn(state, batch, subkey)
    sync(logs["loss"])
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        for _ in range(steps):
            key, subkey = jax.random.split(key)
            state, logs = step_fn(state, batch, subkey)
        sync(logs["loss"])
        best = min(best, time.perf_counter() - start)
    return best / steps * 1e3


def measure(attention, identity_kernel=False):
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.ops import natten_pallas
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import (
        create_train_state,
        make_train_step,
        strip_static,
    )

    saved = (
        natten_pallas.na2d_fused,
        natten_pallas.na2d_fused_dropout,
    )
    if identity_kernel:
        natten_pallas.na2d_fused = lambda q, k, v, *a, **kw: v
        natten_pallas.na2d_fused_dropout = (
            lambda q, k, v, *a, **kw: v
        )
    try:
        rng = np.random.default_rng(0)
        batch = jax.device_put(
            create_batch(
                num_channels=3, num_time=12, height=100, width=100,
                batch_size=32, rng=rng,
            )
        )
        model = CultioNet(
            in_time=12,
            hidden_channels=32,
            dropout=0.1,
            attention_weights=attention,
            dilations=[1, 2],
        )
        tx = build_optimizer(
            optimizer="AdamW", learning_rate=1e-2, weight_decay=1e-4
        )
        state = create_train_state(model, tx, batch, seed=0)
        fn = jax.jit(
            make_train_step(
                loss_name=LossTypes.TANIMOTO_COMBINED,
                precision="bf16",
                jit=False,
            )
        )
        return time_step(
            lambda s, b, r: fn(s, strip_static(b), r), state, batch
        )
    finally:
        natten_pallas.na2d_fused = saved[0]
        natten_pallas.na2d_fused_dropout = saved[1]


def main():
    from cultionet_tpu.enums import AttentionTypes

    out = {}
    out["full"] = measure(AttentionTypes.NATTEN)
    print("full", out["full"], flush=True)
    out["kernel_identity"] = measure(AttentionTypes.NATTEN, True)
    print("kernel_identity", out["kernel_identity"], flush=True)
    out["no_attention"] = measure(None)
    print("no_attention", out["no_attention"], flush=True)

    out["kernel_cost_ms"] = out["full"] - out["kernel_identity"]
    out["plumbing_cost_ms"] = out["kernel_identity"] - out["no_attention"]
    Path("experiments/na_sandwich_split.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
