"""Packed TowerUNetFinal head: parity vs the unpacked stream convs.

The packed path (models/unet_parts.py TowerUNetFinal._packed_streams) runs
all three task streams in single wide convs with a grouped BatchNorm; the
unpacked path is the reference-shaped three-StreamConv2d head (reference
nn/modules/unet_parts.py:227-309). Both must share one parameter tree
(names, shapes, init draws) and agree numerically.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import cultionet_tpu.ops.flags as flags
from cultionet_tpu.models.unet_parts import TowerUNetFinal


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    flags.set_packed_head(None)


def _trees_equal(a, b, tol=0.0):
    la = jtu.tree_leaves_with_path(a)
    lb = jtu.tree_leaves_with_path(b)
    assert [jtu.keystr(k) for k, _ in la] == [jtu.keystr(k) for k, _ in lb]
    for (k, x), (_, y) in zip(la, lb):
        assert x.shape == y.shape, jtu.keystr(k)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=tol, err_msg=jtu.keystr(k)
        )


def _make(resample_factor=0):
    x = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(2, 16, 16, 32))
        .astype(np.float32)
    )
    mod = TowerUNetFinal(num_classes=2, resample_factor=resample_factor)
    return mod, x


def test_param_tree_identical():
    mod, x = _make()
    flags.set_packed_head(False)
    v_u = mod.init(jax.random.PRNGKey(0), x, training=False)
    flags.set_packed_head(True)
    v_p = mod.init(jax.random.PRNGKey(0), x, training=False)
    _trees_equal(v_u, v_p)


def test_forward_parity_eval_and_train():
    mod, x = _make()
    flags.set_packed_head(False)
    variables = mod.init(jax.random.PRNGKey(0), x, training=False)

    flags.set_packed_head(False)
    out_u = mod.apply(variables, x, training=False)
    flags.set_packed_head(True)
    out_p = mod.apply(variables, x, training=False)
    for k in out_u:
        np.testing.assert_allclose(
            np.asarray(out_u[k]), np.asarray(out_p[k]), atol=1e-5
        )

    flags.set_packed_head(False)
    out_u, mut_u = mod.apply(
        variables, x, training=True, mutable=["batch_stats"]
    )
    flags.set_packed_head(True)
    out_p, mut_p = mod.apply(
        variables, x, training=True, mutable=["batch_stats"]
    )
    for k in out_u:
        np.testing.assert_allclose(
            np.asarray(out_u[k]), np.asarray(out_p[k]), atol=1e-5
        )
    _trees_equal(mut_u, mut_p, tol=1e-5)


def test_gradient_parity():
    mod, x = _make()
    flags.set_packed_head(False)
    variables = mod.init(jax.random.PRNGKey(0), x, training=False)

    def loss(params, packed):
        flags.set_packed_head(packed)
        out, _ = mod.apply(
            {**variables, "params": params},
            x,
            training=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.mean(v**2) for v in out.values())

    g_u = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_p = jax.grad(lambda p: loss(p, True))(variables["params"])
    _trees_equal(g_u, g_p, tol=1e-5)


def test_upsampled_tower_parity():
    mod, x = _make(resample_factor=2)
    flags.set_packed_head(False)
    variables = mod.init(
        jax.random.PRNGKey(0), x, size=(32, 32), training=False
    )
    out_u = mod.apply(variables, x, size=(32, 32), training=False)
    flags.set_packed_head(True)
    out_p = mod.apply(variables, x, size=(32, 32), training=False)
    for k in out_u:
        assert out_p[k].shape == out_u[k].shape
        np.testing.assert_allclose(
            np.asarray(out_u[k]), np.asarray(out_p[k]), atol=1e-5
        )
