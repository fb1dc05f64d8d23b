"""Pallas temporal-attention kernel vs the XLA oracle (interpret mode on
CPU; the real Mosaic path runs in the TPU-gated perf suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cultionet_tpu.models.temporal import _attend_t_axis
from cultionet_tpu.ops.temporal_pallas import (
    supported,
    temporal_attention_pallas,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype("float32")
    )


@pytest.mark.parametrize(
    "channels,num_heads", [(64, 4), (32, 2), (128, 8)]
)
def test_forward_parity(channels, num_heads):
    assert supported(channels)
    b, t, h, w = 2, 5, 6, 7
    q = _rand((b, t, h, w, channels), 0)
    k = _rand((b, t, h, w, channels), 1)
    v = _rand((b, t, h, w, channels), 2)
    want = _attend_t_axis(q, k, v, num_heads=num_heads)
    got = temporal_attention_pallas(q, k, v, num_heads, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_forward_parity_pool_query():
    """Tq=1 (learned-query pooling) against the oracle."""
    b, t, h, w, c = 2, 6, 5, 5, 64
    q = _rand((b, 1, h, w, c), 3)
    k = _rand((b, t, h, w, c), 4)
    v = _rand((b, t, h, w, c), 5)
    want = _attend_t_axis(q, k, v, num_heads=4)
    got = temporal_attention_pallas(q, k, v, 4, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_gradient_parity():
    b, t, h, w, c = 2, 4, 4, 5, 64
    q = _rand((b, t, h, w, c), 6)
    k = _rand((b, t, h, w, c), 7)
    v = _rand((b, t, h, w, c), 8)
    cot = _rand((b, t, h, w, c), 9)

    def loss_ref(q, k, v):
        return jnp.sum(_attend_t_axis(q, k, v, num_heads=4) * cot)

    def loss_pl(q, k, v):
        return jnp.sum(temporal_attention_pallas(q, k, v, 4, True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_pl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b_),
            atol=3e-5,
            rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_unaligned_pixel_count():
    """N not divisible by fold*row_block: padding rows must not leak."""
    b, t, h, w, c = 1, 3, 9, 13, 64  # N = 117
    q = _rand((b, t, h, w, c), 10)
    k = _rand((b, t, h, w, c), 11)
    v = _rand((b, t, h, w, c), 12)
    want = _attend_t_axis(q, k, v, num_heads=4)
    got = temporal_attention_pallas(q, k, v, 4, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_transformer_uses_kernel_when_enabled():
    """TemporalTransformer forward equal with flag on (interpret) vs off."""
    from cultionet_tpu.models.temporal import TemporalTransformer
    from cultionet_tpu.ops import flags

    x = _rand((1, 6, 8, 8, 3), 13)
    model = TemporalTransformer(out_channels=8, d_model=32, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)

    import cultionet_tpu.ops.temporal_pallas as tp

    orig = tp.temporal_attention_pallas
    try:
        flags.set_pallas_temporal(False)
        want = model.apply(variables, x, training=False)
        flags.set_pallas_temporal(True)
        # interpret-mode shim so the Mosaic kernel runs on CPU
        tp_interp = lambda q, k, v, n, i=False: orig(q, k, v, n, True)
        tp.temporal_attention_pallas = tp_interp
        got = model.apply(variables, x, training=False)
    finally:
        tp.temporal_attention_pallas = orig
        flags.set_pallas_temporal(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_packed_pipeline_matches_unpacked_module():
    """The packed-layout TemporalTransformer path (block-diag Dense +
    masked-lane LayerNorm + packed attention) must match the unpacked
    module bit-for-bit in tree structure and to fp tolerance in values."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from cultionet_tpu.models.temporal import TemporalTransformer
    from cultionet_tpu.ops import flags

    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 12, 10, 10, 3), jnp.float32
    )
    m = TemporalTransformer(
        out_channels=16, d_model=32, num_heads=4, num_layers=2
    )
    try:
        flags.set_pallas_temporal(False)
        variables = m.init(jax.random.PRNGKey(0), x, training=False)
        ref = m.apply(variables, x, training=False)

        flags.set_pallas_temporal(True)
        v2 = m.init(jax.random.PRNGKey(0), x, training=False)
        p1 = jtu.tree_leaves_with_path(variables["params"])
        p2 = jtu.tree_leaves_with_path(v2["params"])
        assert [(jtu.keystr(k), v.shape) for k, v in p1] == [
            (jtu.keystr(k), v.shape) for k, v in p2
        ]
        for (_, a), (_, b) in zip(p1, p2):
            np.testing.assert_allclose(a, b)  # identical init draws

        out = m.apply(variables, x, training=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )
    finally:
        flags.set_pallas_temporal(None)
