"""Ablation probe: per-step train time by model config (host-readback timed).

Temporary analysis script; run from /root/repo. Results feed BASELINE.md.
"""
import time

import jax
import numpy as np

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import LossTypes
from cultionet_tpu.models import CultioNet
from cultionet_tpu.ops.flags import set_pallas_natten
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import (
    create_train_state,
    make_predict_step,
    make_train_step,
)

BS = 32
rng = np.random.default_rng(0)
batch = create_batch(3, 12, 100, 100, batch_size=BS, rng=rng)
key = jax.random.PRNGKey(0)


def time_train(label, attention, pallas, dropout=0.1, fwd_only=False,
               precision="bf16", hidden=32, remat=False):
    set_pallas_natten(pallas)
    model = CultioNet(
        in_time=12,
        hidden_channels=hidden,
        dropout=dropout,
        attention_weights=attention,
        dilations=[1, 2],
        remat=remat,
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-2)
    state = create_train_state(model, tx, batch, seed=0)
    if fwd_only:
        step = make_predict_step(precision=precision)

        def run(state, k):
            out = step(state, batch)
            return state, out["edge"]
    else:
        tstep = make_train_step(
            loss_name=LossTypes.TANIMOTO_COMBINED, precision=precision
        )

        def run(state, k):
            state, logs = tstep(state, batch, k)
            return state, logs["loss"]

    global key
    # compile + warm
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, probe = run(state, sub)
    float(np.asarray(jax.device_get(probe)).ravel()[0])

    n = 12
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, probe = run(state, sub)
        float(np.asarray(jax.device_get(probe)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms = best / n * 1e3
    print(f"{label:42s} {ms:8.2f} ms/step  {BS/ (best/n):8.1f} chips/s",
          flush=True)
    return ms


print("config                                      ms/step   chips/s",
      flush=True)
time_train("natten+pallas bf16 drop0.1 (baseline)", "natten", True)
time_train("natten XLA    bf16 drop0.1", "natten", False)
time_train("no attention  bf16 drop0.1", None, True)
time_train("spatial_channel bf16 drop0.1", "spatial_channel", True)
time_train("natten+pallas bf16 drop0.0", "natten", True, dropout=0.0)
time_train("natten+pallas bf16 fwd-only", "natten", True, fwd_only=True)
