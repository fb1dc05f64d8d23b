"""TemporalTransformer train-step timing (VERDICT r2 #3 done-criterion).

Times a full train step (fwd+bwd+AdamW, bf16, Tanimoto-combined loss) of
CultioNet with the TemporalTransformer front end at the canonical
production shape (bs=32, 3x12x100x100), comparing the Pallas lane-packed
temporal kernel (ops/temporal_pallas.py) against the batch-chunked XLA
remat fallback (models/temporal.py). Host-readback synchronized, same
harness as bench.py.

Usage: python experiments/temporal_bench.py [--batch-size 32] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402


def _sync(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def bench(pallas: bool, batch_size: int, iters: int) -> float:
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes, LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.ops.flags import set_pallas_temporal
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import (
        create_train_state,
        make_train_step,
        strip_static,
    )

    set_pallas_temporal(pallas)

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        create_batch(
            num_channels=3,
            num_time=12,
            height=100,
            width=100,
            batch_size=batch_size,
            rng=rng,
        )
    )
    model = CultioNet(
        in_time=12,
        hidden_channels=32,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
        temporal_encoder="transformer",
    )
    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-2, weight_decay=1e-4
    )
    state = create_train_state(model, tx, batch, seed=0)
    precision = "bf16" if jax.devices()[0].platform == "tpu" else "fp32"
    step_fn = jax.jit(
        make_train_step(
            loss_name=LossTypes.TANIMOTO_COMBINED,
            precision=precision,
            jit=False,
        ),
        donate_argnums=(0,),
    )

    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, subkey = jax.random.split(key)
        state, logs = step_fn(state, strip_static(batch), subkey)
    _sync(logs["loss"])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, subkey = jax.random.split(key)
            state, logs = step_fn(state, strip_static(batch), subkey)
        _sync(logs["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--xla-too", action="store_true")
    args = ap.parse_args()

    out = {}
    ms = bench(True, args.batch_size, args.iters)
    out["pallas_ms"] = round(ms, 2)
    out["pallas_chips_per_sec"] = round(args.batch_size / ms * 1e3, 1)
    print(f"pallas: {ms:.1f} ms/step "
          f"({args.batch_size / ms * 1e3:.1f} chips/s)", flush=True)
    if args.xla_too:
        ms = bench(False, args.batch_size, args.iters)
        out["xla_ms"] = round(ms, 2)
        out["xla_chips_per_sec"] = round(args.batch_size / ms * 1e3, 1)
        print(f"xla-chunked: {ms:.1f} ms/step "
              f"({args.batch_size / ms * 1e3:.1f} chips/s)", flush=True)
    Path("temporal_bench.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
