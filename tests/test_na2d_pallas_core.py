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


@pytest.mark.parametrize("dilation", [1, 2])
def test_na2d_bf16_storage_dtype_shifts(dilation):
    """bf16 inputs ride the roll/select shift machinery in storage dtype
    (cast to f32 only at the product sites) — values must match the f32
    XLA oracle fed the same bf16-rounded operands, fwd and grad."""
    rng = np.random.default_rng(2)
    shape = (2, 10, 12, 2, 8)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)

    def oracle(q_, k_, v_):
        out = neighborhood_attention_2d(
            q_.astype(jnp.float32),
            k_.astype(jnp.float32),
            v_.astype(jnp.float32),
            3,
            dilation,
        )
        return out.astype(jnp.bfloat16)

    expected, vjp_ref = jax.vjp(oracle, q, k, v)
    got, vjp_fused = jax.vjp(
        lambda q_, k_, v_: na2d_fused(q_, k_, v_, 3, dilation, True),
        q,
        k,
        v,
    )
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=0.05,  # bf16 output rounding + bf16 MXU passes in the kernel
        rtol=0.05,
    )
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32),
            np.asarray(b, dtype=np.float32),
            atol=0.08,
            rtol=0.08,
        )
