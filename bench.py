"""Benchmark: flagship training-step throughput on the canonical chip.

Workload: the reference's canonical chip x=[3 channels, T=12, 100x100]
(README.md:38; BASELINE.json) through the full CultioNet/TowerUNet
(hidden=32, NATTEN attention, ResUNet-a blocks) — forward, multi-task
Tanimoto-combined loss, backward, AdamW update — in bf16 compute / fp32
params on whatever accelerator JAX exposes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the driver-set target of 1 canonical
chip/sec/chip train throughput (BASELINE.json "100x100xT=12 chips/sec/chip");
the reference itself publishes no numbers (BASELINE.md).
"""

import json
import time

import jax
import numpy as np


def main() -> None:
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes, LossTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_train_step

    batch_size = 32
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3,
        num_time=12,
        height=100,
        width=100,
        batch_size=batch_size,
        rng=rng,
    )

    model = CultioNet(
        in_time=12,
        hidden_channels=32,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )
    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-2, weight_decay=1e-4
    )
    state = create_train_state(model, tx, batch, seed=0)

    platform = jax.devices()[0].platform
    precision = "bf16" if platform == "tpu" else "fp32"
    train_step = make_train_step(
        loss_name=LossTypes.TANIMOTO_COMBINED, precision=precision
    )

    key = jax.random.PRNGKey(0)

    # Warmup / compile (several steps: remote-tunnel dispatch backlogs make
    # the first timing window unrepresentative).
    for _ in range(5):
        key, subkey = jax.random.split(key)
        state, logs = train_step(state, batch, subkey)
    jax.block_until_ready(logs["loss"])

    steps = 30
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(steps):
            key, subkey = jax.random.split(key)
            state, logs = train_step(state, batch, subkey)
        jax.block_until_ready(logs["loss"])
        best = min(best, time.perf_counter() - start)

    chips_per_sec = steps * batch_size / best
    target = 1.0  # driver-set floor: 1 canonical chip/sec (BASELINE.json)

    print(
        json.dumps(
            {
                "metric": "train_chips_per_sec_100x100xT12",
                "value": round(chips_per_sec, 3),
                "unit": f"chips/sec ({platform}, bs={batch_size}, {precision})",
                "vs_baseline": round(chips_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
