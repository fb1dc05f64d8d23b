"""Neighborhood attention: shift-based XLA path vs gather oracle vs a
brute-force numpy implementation of NATTEN clamped-window semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.ops.natten import (
    _axis_neighbor_indices,
    neighborhood_attention_2d,
    neighborhood_attention_2d_ref,
)


def brute_force_na2d(q, k, v, kernel_size, dilation):
    """Per-pixel loop implementation of NATTEN semantics (numpy)."""
    b, h, w, n, d = q.shape
    idx_h = _axis_neighbor_indices(h, kernel_size, dilation)
    idx_w = _axis_neighbor_indices(w, kernel_size, dilation)
    scale = d**-0.5
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            for wi in range(w):
                for ni in range(n):
                    keys = k[bi][np.ix_(idx_h[hi], idx_w[wi])][:, :, ni]
                    vals = v[bi][np.ix_(idx_h[hi], idx_w[wi])][:, :, ni]
                    logits = (
                        keys.reshape(-1, d) @ (q[bi, hi, wi, ni] * scale)
                    )
                    weights = np.exp(logits - logits.max())
                    weights /= weights.sum()
                    out[bi, hi, wi, ni] = weights @ vals.reshape(-1, d)
    return out


@pytest.mark.parametrize(
    "hw,kernel,dilation",
    [
        ((10, 10), 3, 1),
        ((10, 12), 3, 2),
        ((9, 11), 3, 2),  # ragged cosets -> gather fallback
        ((7, 7), 5, 1),
        ((8, 8), 1, 1),
    ],
)
def test_na2d_matches_brute_force(hw, kernel, dilation):
    rng = np.random.default_rng(0)
    h, w = hw
    q = rng.normal(size=(2, h, w, 2, 4)).astype("float32")
    k = rng.normal(size=(2, h, w, 2, 4)).astype("float32")
    v = rng.normal(size=(2, h, w, 2, 4)).astype("float32")

    expected = brute_force_na2d(q, k, v, kernel, dilation)

    got = neighborhood_attention_2d(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kernel, dilation
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    got_ref = neighborhood_attention_2d_ref(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kernel, dilation
    )
    np.testing.assert_allclose(np.asarray(got_ref), expected, atol=1e-5)


def test_na2d_kernel1_is_identity_of_values():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 6, 6, 1, 8)).astype("float32"))
    k = jnp.asarray(rng.normal(size=(1, 6, 6, 1, 8)).astype("float32"))
    v = jnp.asarray(rng.normal(size=(1, 6, 6, 1, 8)).astype("float32"))
    out = neighborhood_attention_2d(q, k, v, kernel_size=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_na2d_grad_flows():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 8, 8, 2, 4)).astype("float32"))

    def loss(q):
        return jnp.sum(
            neighborhood_attention_2d(q, q, q, kernel_size=3, dilation=2)
        )

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
