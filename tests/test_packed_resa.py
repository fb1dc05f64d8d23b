"""Packed ResidualAConv branches: parity vs the unpacked sequential path.

The packed path (nn/blocks.py ResidualAConv._packed_branches) runs the
parallel ResUNet-a dilated branches (reference convolution.py:250-395) as
one concatenated conv + one grouped conv; the unpacked path is the
reference-shaped per-branch ResConvBlock2d stack. Both must share one
parameter tree (names, shapes, init draws) and agree numerically.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import cultionet_tpu.ops.flags as flags
from cultionet_tpu.nn.blocks import ResidualAConv

Array = jax.Array


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    flags.set_packed_resa(None)


def _trees_equal(a, b, tol=0.0):
    la = jtu.tree_leaves_with_path(a)
    lb = jtu.tree_leaves_with_path(b)
    assert [jtu.keystr(k) for k, _ in la] == [jtu.keystr(k) for k, _ in lb]
    for (k, x), (_, y) in zip(la, lb):
        assert x.shape == y.shape, jtu.keystr(k)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=tol, err_msg=jtu.keystr(k)
        )


def _make(in_channels=24, out_channels=16, dilations=(1, 2), **kw):
    x = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(2, 12, 12, in_channels))
        .astype(np.float32)
    )
    mod = ResidualAConv(
        out_channels=out_channels, dilations=list(dilations), **kw
    )
    return mod, x


def test_param_tree_identical():
    mod, x = _make()
    flags.set_packed_resa(False)
    v_u = mod.init(jax.random.PRNGKey(0), x, training=False)
    flags.set_packed_resa(True)
    v_p = mod.init(jax.random.PRNGKey(0), x, training=False)
    _trees_equal(v_u, v_p)


@pytest.mark.parametrize("same_channels", [False, True])
def test_forward_parity_eval_and_train(same_channels):
    mod, x = _make(in_channels=16 if same_channels else 24)
    flags.set_packed_resa(False)
    variables = mod.init(jax.random.PRNGKey(0), x, training=False)

    out_u = mod.apply(variables, x, training=False)
    flags.set_packed_resa(True)
    out_p = mod.apply(variables, x, training=False)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_p), atol=1e-5
    )

    flags.set_packed_resa(False)
    out_u, mut_u = mod.apply(
        variables, x, training=True, mutable=["batch_stats"]
    )
    flags.set_packed_resa(True)
    out_p, mut_p = mod.apply(
        variables, x, training=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_p), atol=1e-5
    )
    _trees_equal(mut_u, mut_p, tol=1e-5)


def test_gradient_parity():
    mod, x = _make()
    flags.set_packed_resa(False)
    variables = mod.init(jax.random.PRNGKey(0), x, training=False)

    def loss(params, packed):
        flags.set_packed_resa(packed)
        out, _ = mod.apply(
            {**variables, "params": params},
            x,
            training=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(out**2)

    g_u = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_p = jax.grad(lambda p: loss(p, True))(variables["params"])
    _trees_equal(g_u, g_p, tol=1e-5)


def test_natten_block_parity():
    """The attention path consumes the packed-branch sum identically."""
    mod, x = _make(
        in_channels=16,
        out_channels=16,
        attention_weights="natten",
        natten_num_heads=4,
        natten_kernel_size=3,
        natten_dilation=1,
    )
    flags.set_packed_resa(False)
    variables = mod.init(jax.random.PRNGKey(0), x, training=False)
    out_u = mod.apply(variables, x, training=False)
    flags.set_packed_resa(True)
    out_p = mod.apply(variables, x, training=False)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_p), atol=1e-5
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(dilations=(1, 2, 3)),  # d=3 changes geometry
        dict(num_blocks=1),
        dict(kernel_size=1),
        dict(batchnorm_first=True),
    ],
)
def test_unpackable_configs_fall_back(kw):
    """Configs outside the packing contract run unpacked (and still work)."""
    mod, x = _make(**kw)
    flags.set_packed_resa(True)
    v = mod.init(jax.random.PRNGKey(0), x, training=False)
    flags.set_packed_resa(False)
    v_u = mod.init(jax.random.PRNGKey(0), x, training=False)
    _trees_equal(v, v_u)
    out = mod.apply(v, x, training=False)
    assert np.isfinite(np.asarray(out)).all()
