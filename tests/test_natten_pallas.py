"""Fused Pallas NA block vs the XLA reference composition (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.ops.natten_pallas import (
    fused_na_block,
    na_block_pallas,
    na_block_reference,
)


def make_params(rng, channels):
    return {
        "ln1_scale": jnp.asarray(
            rng.normal(1.0, 0.1, size=(channels,)), dtype=jnp.float32
        ),
        "ln1_bias": jnp.asarray(
            rng.normal(0.0, 0.1, size=(channels,)), dtype=jnp.float32
        ),
        "w_qkv": jnp.asarray(
            rng.normal(0.0, 0.2, size=(channels, 3 * channels)),
            dtype=jnp.float32,
        ),
        "b_qkv": jnp.asarray(
            rng.normal(0.0, 0.1, size=(3 * channels,)), dtype=jnp.float32
        ),
        "w_proj": jnp.asarray(
            rng.normal(0.0, 0.2, size=(channels, channels)),
            dtype=jnp.float32,
        ),
        "b_proj": jnp.asarray(
            rng.normal(0.0, 0.1, size=(channels,)), dtype=jnp.float32
        ),
        "ln2_scale": jnp.asarray(
            rng.normal(1.0, 0.1, size=(channels,)), dtype=jnp.float32
        ),
        "ln2_bias": jnp.asarray(
            rng.normal(0.0, 0.1, size=(channels,)), dtype=jnp.float32
        ),
    }


@pytest.mark.parametrize(
    "hw,heads,channels,dilation",
    [
        ((12, 12), 2, 8, 1),
        ((16, 12), 4, 16, 1),
        ((12, 16), 2, 8, 2),
    ],
)
def test_pallas_matches_reference(hw, heads, channels, dilation):
    rng = np.random.default_rng(0)
    h, w = hw
    x = jnp.asarray(
        rng.normal(size=(2, h, w, channels)), dtype=jnp.float32
    )
    params = make_params(rng, channels)

    expected = na_block_reference(
        x, params, num_heads=heads, kernel_size=3, dilation=dilation
    )
    got = na_block_pallas(
        x, params, num_heads=heads, kernel_size=3, dilation=dilation,
        interpret=True,
    )
    # bf16 matmuls inside the kernel: tolerate bf16-level error.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=0.06, rtol=0.05
    )


def test_fused_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), dtype=jnp.float32)
    params = make_params(rng, 8)

    cotangent = jnp.asarray(
        rng.normal(size=(1, 8, 8, 8)), dtype=jnp.float32
    )

    _, vjp_fused = jax.vjp(
        lambda x_, p_: fused_na_block(x_, p_, 2, 3, 1, True), x, params
    )
    _, vjp_ref = jax.vjp(
        lambda x_, p_: na_block_reference(x_, p_, 2, 3, 1), x, params
    )
    gx_fused, gp_fused = vjp_fused(cotangent)
    gx_ref, gp_ref = vjp_ref(cotangent)

    # Backward is the XLA path on both sides -> near-exact up to the fwd
    # residual difference (none: residuals are the raw inputs).
    np.testing.assert_allclose(
        np.asarray(gx_fused), np.asarray(gx_ref), rtol=1e-5, atol=1e-5
    )
    for key in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp_fused[key]),
            np.asarray(gp_ref[key]),
            rtol=1e-5,
            atol=1e-5,
            err_msg=key,
        )
