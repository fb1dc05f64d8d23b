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


def test_class_weights_from_counts():
    from cultionet_tpu.train.step import class_weights_from_counts

    w = class_weights_from_counts(
        crop_counts=[900, 100], edge_counts=[990, 10]
    )
    # w_c = n / (k * n_c): minority class upweighted
    np.testing.assert_allclose(w["crop"], [1000 / 1800, 1000 / 200])
    np.testing.assert_allclose(w["edge"], [1000 / 1980, 1000 / 20])
    # absent classes zero out instead of inf
    w0 = class_weights_from_counts(crop_counts=[100, 0], edge_counts=[0, 5])
    assert w0["crop"][1] == 0.0 and w0["edge"][0] == 0.0
    # multi-crop-class counts collapse to binary foreground
    wm = class_weights_from_counts(
        crop_counts=[800, 100, 100], edge_counts=[99, 1]
    )
    np.testing.assert_allclose(wm["crop"], [1000 / 1600, 1000 / 400])


def test_scale_pos_weight_changes_loss():
    """Weighted classification losses differ from unweighted on imbalanced
    labels (the reference accepts scale_pos_weight but never wires it —
    lightning.py:589-604 is commented out; here it is functional)."""
    from cultionet_tpu.train.step import (
        calc_loss,
        class_weights_from_counts,
    )

    rng = np.random.default_rng(7)
    batch = create_batch(
        num_channels=2, num_time=6, height=16, width=16, batch_size=2, rng=rng
    )
    preds = {
        "distance": jax.numpy.asarray(
            rng.random((2, 16, 16, 1), dtype=np.float32)
        ),
        "edge": jax.numpy.asarray(
            rng.random((2, 16, 16, 1), dtype=np.float32)
        ),
        "crop": jax.numpy.asarray(
            rng.random((2, 16, 16, 1), dtype=np.float32)
        ),
    }
    base, _ = calc_loss(preds, batch)
    weighted, _ = calc_loss(
        preds,
        batch,
        class_weights=class_weights_from_counts([900, 100], [990, 10]),
    )
    assert np.isfinite(float(base)) and np.isfinite(float(weighted))
    assert abs(float(base) - float(weighted)) > 1e-4


def test_swa_bn_reestimation_updates_stats(tmp_path):
    """BatchNorm running stats are recomputed under averaged params after
    SWA (torch update_bn semantics; VERDICT weak #4)."""
    from cultionet_tpu.data.datasets import ChipDataset
    from cultionet_tpu.data.loader import ChipLoader
    from cultionet_tpu.train.fit import _reestimate_batch_stats

    rng = np.random.default_rng(11)
    for i in range(4):
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        ).to_file(tmp_path / "processed" / f"data_{i:03d}.npz")
    ds = ChipDataset(tmp_path)
    loader = ChipLoader(ds, batch_size=2)

    batch = next(iter(loader))
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)
    state = create_train_state(model, tx, batch, seed=0)
    assert state.batch_stats, "model should carry BatchNorm stats"

    new_state = _reestimate_batch_stats(state, loader, "fp32")
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    deltas = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(before, after)
    ]
    assert max(deltas) > 1e-6, "stats unchanged — re-estimation did nothing"


def test_in_step_normalization_matches_host():
    """make_train_step(norm_stats=...) on a packed batch equals the plain
    step on a host-normalized float batch (up to int16 quantization)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    batch = create_batch(
        num_channels=2, num_time=6, height=16, width=16, batch_size=2,
        rng=rng,
    )
    mean = np.asarray([0.4, 0.6], dtype=np.float32)
    std = np.asarray([0.2, 0.3], dtype=np.float32)

    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)
    state = create_train_state(model, tx, batch, seed=0)
    key = jax.random.PRNGKey(0)

    # host-normalized float path
    host_batch = batch.replace(x=(batch.x - mean) / std)
    plain = make_train_step(precision="fp32", donate=False)
    _, logs_host = plain(state, host_batch, key)

    # packed + in-step normalization path (quantize to the int16 grid)
    packed = batch.replace(
        x=np.round(np.asarray(batch.x) * 10000).astype(np.int16),
        y=np.asarray(batch.y, dtype=np.int16),
        bdist=np.round(np.asarray(batch.bdist) * 10000).astype(np.int16),
    )
    fused = make_train_step(
        precision="fp32", donate=False, norm_stats=(mean, std)
    )
    _, logs_packed = fused(state, packed, key)

    np.testing.assert_allclose(
        float(logs_host["loss"]), float(logs_packed["loss"]), atol=2e-3
    )


def test_momentum_cycling_schedule():
    """OneCycle beta1 cycling (torch cycle_momentum parity): 0.95 at the
    start, 0.85 at the warmup peak, back to 0.95 at the end."""
    import numpy as np

    from cultionet_tpu.train.optim import (
        build_momentum_schedule,
        build_optimizer,
    )

    sched = build_momentum_schedule("OneCycleLR", epochs=10, steps_per_epoch=10)
    total, warm = 100, 30
    assert abs(float(sched(0)) - 0.95) < 1e-6
    assert abs(float(sched(warm)) - 0.85) < 1e-6
    assert abs(float(sched(total)) - 0.95) < 1e-6
    assert build_momentum_schedule("StepLR", 10, 10) is None

    # optimizer builds and steps with the cycling beta1
    import jax.numpy as jnp
    import optax

    tx = build_optimizer(
        optimizer="AdamW", learning_rate=1e-3, b1_schedule=sched
    )
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
