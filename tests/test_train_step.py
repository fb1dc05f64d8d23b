"""End-to-end slice: jitted train step on a tiny TowerUNet — loss decreases.

Mirrors the reference's e2e training smoke test (tests/test_train.py:53-94)
at unit-test scale.
"""

import jax
import numpy as np

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import AttentionTypes, LossTypes
from cultionet_tpu.models import CultioNet
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def test_train_step_loss_decreases():
    rng = np.random.default_rng(42)
    batch = create_batch(
        num_channels=3,
        num_time=6,
        height=24,
        width=24,
        batch_size=2,
        rng=rng,
    )

    model = CultioNet(
        in_time=6,
        hidden_channels=8,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )
    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-3, weight_decay=1e-4
    )
    state = create_train_state(model, tx, batch, seed=0)

    train_step = make_train_step(loss_name=LossTypes.TANIMOTO_COMBINED)
    key = jax.random.PRNGKey(0)

    losses = []
    for step in range(8):
        key, subkey = jax.random.split(key)
        state, logs = train_step(state, batch, subkey)
        losses.append(float(logs["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_eval_step_metrics():
    rng = np.random.default_rng(7)
    batch = create_batch(
        num_channels=3, num_time=6, height=24, width=24, batch_size=2, rng=rng
    )
    model = CultioNet(
        in_time=6,
        hidden_channels=8,
        attention_weights=None,
        dilations=[1, 2],
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)
    state = create_train_state(model, tx, batch, seed=1)

    eval_step = make_eval_step()
    metrics = eval_step(state, batch)

    for key in (
        "loss",
        "dist_mae",
        "dist_mse",
        "edge_f1",
        "crop_f1",
        "edge_mcc",
        "crop_mcc",
        "score",
    ):
        value = float(metrics[key])
        assert np.isfinite(value), f"{key} not finite"

    assert 0.0 <= float(metrics["edge_f1"]) <= 1.0
    assert -1.0 <= float(metrics["edge_mcc"]) <= 1.0


def test_gradient_accumulation_runs():
    rng = np.random.default_rng(3)
    batch = create_batch(
        num_channels=3, num_time=6, height=16, width=16, batch_size=1, rng=rng
    )
    model = CultioNet(
        in_time=6,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
    )
    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-3, accumulate_grad_batches=2
    )
    state = create_train_state(model, tx, batch, seed=0)
    train_step = make_train_step()
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        key, subkey = jax.random.split(key)
        state, logs = train_step(state, batch, subkey)
    assert np.isfinite(float(logs["loss"]))
