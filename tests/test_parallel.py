"""Data-parallel training on a virtual 8-device CPU mesh.

Exercises the pjit sharding path the reference never tests (it trusts
Lightning DDP; SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.models import CultioNet
from cultionet_tpu.parallel import (
    create_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import create_train_state, make_train_step


# Function-scoped: the sharded train step donates its state argument, and
# device_put may alias the source buffer for same-device shards — a shared
# module-scoped state would be deleted by the first donating test.
@pytest.fixture()
def tiny_setup():
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=2, num_time=5, height=16, width=16, batch_size=8, rng=rng
    )
    model = CultioNet(
        in_time=5, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)
    state = create_train_state(model, tx, batch, seed=0)
    return model, state, batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_train_step_runs(tiny_setup):
    _, state, batch = tiny_setup
    mesh = create_mesh()
    assert mesh.shape["data"] == 8

    sharded_batch = shard_batch(batch, mesh)
    sharded_state = replicate_state(state, mesh)

    train_step = make_sharded_train_step(mesh, precision="fp32")
    rng = jax.random.PRNGKey(0)
    new_state, logs = train_step(sharded_state, sharded_batch, rng)
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1

    eval_step = make_sharded_eval_step(mesh, precision="fp32")
    metrics = eval_step(new_state, sharded_batch)
    assert np.isfinite(float(metrics["score"]))


def test_sharded_matches_single_device(tiny_setup):
    """The 8-way sharded step must produce the same loss and the same updated
    params as the single-device step (global BN stats + global grads)."""
    _, state, batch = tiny_setup
    mesh = create_mesh()

    rng = jax.random.PRNGKey(1)

    single_step = make_train_step(precision="fp32", donate=False)
    single_state, single_logs = single_step(state, batch, rng)

    train_step = make_sharded_train_step(mesh, precision="fp32")
    sharded_state, sharded_logs = train_step(
        replicate_state(state, mesh), shard_batch(batch, mesh), rng
    )

    np.testing.assert_allclose(
        float(single_logs["loss"]), float(sharded_logs["loss"]), rtol=1e-5
    )

    single_params = jax.tree_util.tree_leaves(single_state.params)
    sharded_params = jax.tree_util.tree_leaves(sharded_state.params)
    for a, b in zip(single_params, sharded_params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fsdp_sharded_matches_single_device(tiny_setup):
    """FSDP (params + optimizer moments sharded over the data axis) must be
    numerically identical to the single-device step — GSPMD's all-gathers /
    reduce-scatters are invisible to the math."""
    from cultionet_tpu.parallel import fsdp_state_sharding, shard_state_fsdp

    _, state, batch = tiny_setup
    mesh = create_mesh()
    rng = jax.random.PRNGKey(1)

    single_step = make_train_step(precision="fp32", donate=False)
    single_state, single_logs = single_step(state, batch, rng)

    # min_size=128 so the tiny test model actually shards tensors.
    fsdp_state, shardings = shard_state_fsdp(state, mesh, min_size=128)
    # at least one parameter must really be sharded
    sharded_leaves = [
        s
        for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        if any(p is not None for p in s.spec)
    ]
    assert sharded_leaves, "expected at least one FSDP-sharded tensor"

    train_step = make_sharded_train_step(
        mesh, precision="fp32", state_shardings=fsdp_state_sharding(
            state, mesh, min_size=128
        )
    )
    fsdp_out, fsdp_logs = train_step(fsdp_state, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(
        float(single_logs["loss"]), float(fsdp_logs["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(single_state.params),
        jax.tree_util.tree_leaves(fsdp_out.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

    eval_step = make_sharded_eval_step(
        mesh,
        precision="fp32",
        state_shardings=fsdp_state_sharding(state, mesh, min_size=128),
    )
    metrics = eval_step(fsdp_out, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["score"]))


def test_process_local_selection_partitions():
    from cultionet_tpu.data.loader import process_local_selection

    n, P = 23, 4
    parts = [process_local_selection(n, p, P) for p in range(P)]
    allidx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allidx, np.arange(n))  # disjoint + complete
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_global_batch_from_local_single_process(tiny_setup):
    """With one process, make_array_from_process_local_data assembly equals
    a plain sharded device_put — the unit-checkable half of the multi-host
    input path (the strided file selection is the other half)."""
    from cultionet_tpu.parallel import batch_sharding
    from cultionet_tpu.parallel.mesh import global_batch_from_local

    _, _, batch = tiny_setup
    mesh = create_mesh()
    sharding = batch_sharding(mesh)

    via_local = global_batch_from_local(batch, sharding)
    via_put = shard_batch(batch, mesh)

    assert via_local.x.sharding.is_equivalent_to(
        via_put.x.sharding, via_put.x.ndim
    )
    np.testing.assert_array_equal(
        np.asarray(via_local.x), np.asarray(via_put.x)
    )
    np.testing.assert_array_equal(
        np.asarray(via_local.y), np.asarray(via_put.y)
    )
