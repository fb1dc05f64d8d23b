"""Pallas attention-core kernel vs the XLA implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.ops.natten import neighborhood_attention_2d
from cultionet_tpu.ops.natten_pallas import na2d_fused, na2d_pallas


@pytest.mark.parametrize(
    "hw,heads,dim,dilation",
    [
        ((10, 10), 2, 8, 1),
        ((12, 16), 4, 16, 1),
        ((16, 12), 2, 8, 2),
        ((9, 9), 2, 8, 1),  # HW not a multiple of the pad tile
    ],
)
def test_na2d_pallas_matches_xla(hw, heads, dim, dilation):
    rng = np.random.default_rng(0)
    h, w = hw
    q = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)

    expected = neighborhood_attention_2d(q, k, v, 3, dilation)
    got = na2d_pallas(q, k, v, 3, dilation, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4
    )


def test_na2d_fused_grad_matches_xla():
    rng = np.random.default_rng(1)
    shape = (1, 8, 8, 2, 4)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    _, vjp_fused = jax.vjp(
        lambda q_, k_, v_: na2d_fused(q_, k_, v_, 3, 1, True), q, k, v
    )
    _, vjp_ref = jax.vjp(
        lambda q_, k_, v_: neighborhood_attention_2d(q_, k_, v_, 3, 1),
        q,
        k,
        v,
    )
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
