"""Full-train-step A/B for the lane-packed ResidualAConv branches.

Times the flagship train step (CultioNet hidden=32, Pallas NA, bf16,
bs=32, canonical 3x12x100x100 chips) with the packed-ResA flag off/on.
Same harness as bench.py: host-readback sync (jax.block_until_ready does
not wait on the tunneled axon platform), best-of-3 windows of 30 steps.

Usage: python experiments/packed_resa_step.py [--hidden 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def sync(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def measure(hidden: int, batch_size: int = 32) -> dict:
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes, LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import (
        create_train_state,
        make_train_step,
        strip_static,
    )

    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3,
        num_time=12,
        height=100,
        width=100,
        batch_size=batch_size,
        rng=rng,
    )
    batch = jax.device_put(batch)

    model = CultioNet(
        in_time=12,
        hidden_channels=hidden,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
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
        key, subkey = jax.random.split(key)
        new_state, logs = step_fn(state, strip_static(batch), subkey)
    sync(logs["loss"])

    steps = 30
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(steps):
            key, subkey = jax.random.split(key)
            new_state, logs = step_fn(new_state, strip_static(batch), subkey)
        sync(logs["loss"])
        best = min(best, time.perf_counter() - start)
    ms = best / steps * 1e3
    return {"ms": ms, "chips_per_sec": steps * batch_size / best * steps / steps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    args = ap.parse_args()

    import cultionet_tpu.ops.flags as flags

    out = {}
    for packed in (False, True):
        flags.set_packed_resa(packed)
        out["packed" if packed else "unpacked"] = measure(args.hidden)
        print(packed, out["packed" if packed else "unpacked"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
