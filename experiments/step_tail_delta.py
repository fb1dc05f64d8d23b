"""Whole-step deltas for the non-model tail of the train step.

The per-fragment MFU ablation (experiments/mfu_ablation.py) covers the
model fwd+bwd; the NA delta (attention_delta_step.py) covers attention.
What remains unattributed (~9-10 ms of the 96.9 ms step at h=32) is the
tail: multi-task Tanimoto loss + label derivation, the AdamW update +
per-step bf16 param cast, and BN-stat bookkeeping. Standalone timing of
sub-10 ms ops is untrustworthy over the tunnel (BASELINE.md), so each
component is measured as a WHOLE-STEP A/B delta:

  loss tail  = step(full) - step(dummy sum-of-outputs loss)
  optimizer  = step(AdamW) - step(SGD)

Usage: python experiments/step_tail_delta.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


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


def main():
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes, LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.precision import cast_floating
    from cultionet_tpu.train.step import (
        calc_loss,
        create_train_state,
        make_train_step,
        strip_static,
    )

    batch_size, hidden = 32, 32
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3, num_time=12, height=100, width=100,
        batch_size=batch_size, rng=rng,
    )
    batch = jax.device_put(batch)

    model = CultioNet(
        in_time=12,
        hidden_channels=hidden,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )

    def make_variant(optimizer: str, dummy_loss: bool):
        tx = build_optimizer(
            optimizer=optimizer, learning_rate=1e-2, weight_decay=1e-4
        )
        state = create_train_state(model, tx, batch, seed=0)
        if not dummy_loss:
            fn = jax.jit(
                make_train_step(
                    loss_name=LossTypes.TANIMOTO_COMBINED,
                    precision="bf16",
                    jit=False,
                )
            )
            return state, lambda s, b, r: fn(s, strip_static(b), r)

        # Same step, but the multi-task loss + label derivation replaced
        # by a raw sum over the three output planes (grad still flows
        # through the full model).
        def train_step(state, b, rng_key):
            b = b.dequantize()

            def loss_fn(params):
                run_params = cast_floating(params, jnp.bfloat16)
                run_batch = b.replace(x=b.x.astype(jnp.bfloat16))
                outputs, mutated = state.apply_fn(
                    {
                        "params": run_params,
                        "batch_stats": cast_floating(
                            state.batch_stats, jnp.bfloat16
                        ),
                    },
                    run_batch,
                    training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng_key},
                )
                loss = sum(
                    jnp.mean(o.astype(jnp.float32))
                    for o in outputs.values()
                    if o is not None
                )
                return loss, cast_floating(
                    mutated["batch_stats"], jnp.float32
                )

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(grads=grads)
            state = state.replace(batch_stats=new_stats)
            return state, {"loss": loss}

        fn = jax.jit(train_step)
        return state, lambda s, b, r: fn(s, strip_static(b), r)

    out = {}
    for name, optimizer, dummy in (
        ("full_adamw", "AdamW", False),
        ("dummy_loss_adamw", "AdamW", True),
        ("full_sgd", "SGD", False),
    ):
        state, fn = make_variant(optimizer, dummy)
        out[name] = time_step(fn, state, batch)
        print(name, out[name], flush=True)

    out["loss_tail_ms"] = out["full_adamw"] - out["dummy_loss_adamw"]
    out["optimizer_delta_ms"] = out["full_adamw"] - out["full_sgd"]
    Path("experiments/step_tail_delta.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
