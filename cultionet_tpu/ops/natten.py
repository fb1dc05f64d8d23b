"""2-D (dilated) neighborhood attention, TPU-native.

Re-implements the behavior of the NATTEN CUDA kernels used by the reference
(natten.functional.na2d at /root/reference/src/cultionet/nn/modules/attention.py:7
and natten.NeighborhoodAttention2D at nn/modules/convolution.py:341): every
query attends to a ``kernel_size x kernel_size`` window of keys. NATTEN
semantics, which differ from zero-padded local attention, are preserved
exactly: near image borders the window *slides inward* (clamped window start)
so each query always attends to exactly ``k*k`` keys; with dilation ``d`` the
window is composed within the query's (h % d, w % d) coset.

Two implementations:

- ``neighborhood_attention_2d``: the default XLA path. Clamped windows are
  monotone index maps with plateaus at the borders, so each of the k*k shifted
  key/value tensors is built from **static slices + concat** — zero gathers,
  fully fusible elementwise math on the VPU. Dilation is folded directly into
  the slice offsets (a shift of ``d`` image rows/cols per window step), which
  is exact for ANY H, W — no coset reshape, no ragged-shape fallback, and no
  layout-churning transposes on the hot path.
- ``neighborhood_attention_2d_ref``: a gather-based oracle used for testing.

Both take ``q, k, v`` shaped ``(B, H, W, num_heads, head_dim)`` and return the
same shape, matching natten's functional na2d signature.
"""

import typing as T

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _axis_neighbor_indices(
    length: int, kernel_size: int, dilation: int
) -> np.ndarray:
    """Static (length, kernel_size) table of neighbor indices along one axis
    under NATTEN clamped-window semantics with dilation."""
    idx = np.empty((length, kernel_size), dtype=np.int32)
    half = kernel_size // 2
    for i in range(length):
        coset = i % dilation
        pos = i // dilation
        coset_len = (length - coset + dilation - 1) // dilation
        start = min(max(pos - half, 0), coset_len - kernel_size)
        idx[i] = coset + dilation * (start + np.arange(kernel_size))
    return idx


def neighborhood_attention_2d_ref(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    weights_fn: T.Optional[T.Callable[[Array], Array]] = None,
) -> Array:
    """Gather-based oracle (exact for any shape)."""
    _, height, width, _, head_dim = q.shape
    if min(height, width) < kernel_size * dilation:
        raise ValueError(
            f"Spatial dims ({height}x{width}) must be >= "
            f"kernel_size*dilation ({kernel_size * dilation})."
        )

    idx_h = _axis_neighbor_indices(height, kernel_size, dilation)
    idx_w = _axis_neighbor_indices(width, kernel_size, dilation)

    # (B, H, kh, W, N, D) then (B, H, kh, W, kw, N, D)
    k_nbr = jnp.take(k, jnp.asarray(idx_h).reshape(-1), axis=1).reshape(
        k.shape[0], height, kernel_size, width, *k.shape[3:]
    )
    k_nbr = jnp.take(k_nbr, jnp.asarray(idx_w).reshape(-1), axis=3).reshape(
        k.shape[0], height, kernel_size, width, kernel_size, *k.shape[3:]
    )
    v_nbr = jnp.take(v, jnp.asarray(idx_h).reshape(-1), axis=1).reshape(
        v.shape[0], height, kernel_size, width, *v.shape[3:]
    )
    v_nbr = jnp.take(v_nbr, jnp.asarray(idx_w).reshape(-1), axis=3).reshape(
        v.shape[0], height, kernel_size, width, kernel_size, *v.shape[3:]
    )

    scale = head_dim**-0.5
    logits = jnp.einsum("bhwnd,bhiwjnd->bhwnij", q * scale, k_nbr)
    logits = logits.reshape(*logits.shape[:4], kernel_size * kernel_size)
    weights = jax.nn.softmax(logits, axis=-1)
    if weights_fn is not None:
        weights = weights_fn(weights)
    weights = weights.reshape(
        *weights.shape[:4], kernel_size, kernel_size
    )
    return jnp.einsum("bhwnij,bhiwjnd->bhwnd", weights, v_nbr)


def _clamped_shift(
    x: Array, kernel_size: int, j: int, axis: int, dilation: int = 1
) -> Array:
    """Dilated clamped-window shift along one image axis using only static
    slices and concatenation.

    For a query at position ``p`` with coset position ``pos = p // d``:
    ``out[p] = x[coset + d * (clip(pos - k//2, 0, len - k) + j)]``. The index
    map is monotone with plateaus of ``d * k//2`` positions at each border
    (all border queries in the same window step read the same key), so it is
    a concat of: the border slice tiled ``k//2`` times, the shifted interior,
    and the far-border slice tiled ``k//2`` times — exact for any length,
    ragged cosets included.
    """
    length = x.shape[axis]
    half = kernel_size // 2
    d = dilation

    def sl(start: int, stop: int) -> Array:
        index = [slice(None)] * x.ndim
        index[axis] = slice(start, stop)
        return x[tuple(index)]

    if half == 0:
        return x

    middle = sl(d * j, d * j + length - 2 * d * half)
    first = [sl(d * j, d * j + d)] * half
    last = [sl(length + d * (j - kernel_size), length + d * (j - kernel_size) + d)] * half
    return jnp.concatenate(first + [middle] + last, axis=axis)


def neighborhood_attention_2d(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    weights_fn: T.Optional[T.Callable[[Array], Array]] = None,
) -> Array:
    """Fused-by-XLA neighborhood attention; exact NATTEN semantics.

    q, k, v: (B, H, W, num_heads, head_dim) -> (B, H, W, num_heads, head_dim)

    ``weights_fn`` (optional) is applied to the post-softmax attention
    weights — used for attention dropout by the NeighborhoodAttention2D
    module. Callers are expected to jit the enclosing computation.
    """
    _, height, width, _, head_dim = q.shape
    if min(height, width) < kernel_size * dilation:
        raise ValueError(
            f"Spatial dims ({height}x{width}) must be >= "
            f"kernel_size*dilation ({kernel_size * dilation})."
        )

    if kernel_size == 1:
        # A one-key window's softmax weight is identically 1: out == v.
        if weights_fn is None:
            return v
        ones = jnp.ones(v.shape[:4] + (1,), dtype=v.dtype)
        return weights_fn(ones)[..., 0:1] * v

    scale = jnp.asarray(head_dim**-0.5, dtype=q.dtype)
    qs = q * scale

    logits = []
    shifted_v = []
    for jh in range(kernel_size):
        k_h = _clamped_shift(k, kernel_size, jh, axis=1, dilation=dilation)
        v_h = _clamped_shift(v, kernel_size, jh, axis=1, dilation=dilation)
        for jw in range(kernel_size):
            k_hw = _clamped_shift(
                k_h, kernel_size, jw, axis=2, dilation=dilation
            )
            logits.append(jnp.sum(qs * k_hw, axis=-1))
            shifted_v.append(
                _clamped_shift(v_h, kernel_size, jw, axis=2, dilation=dilation)
            )

    logits = jnp.stack(logits, axis=-1)  # (B, H, W, N, k*k)
    weights = jax.nn.softmax(logits, axis=-1)
    if weights_fn is not None:
        weights = weights_fn(weights)

    out = jnp.zeros_like(v)
    for idx, v_hw in enumerate(shifted_v):
        out = out + weights[..., idx, None] * v_hw
    return out


def na2d(
    q: Array, k: Array, v: Array, kernel_size: int, dilation: int = 1
) -> Array:
    """Alias matching natten.functional.na2d's name and argument order."""
    return neighborhood_attention_2d(
        q, k, v, kernel_size=kernel_size, dilation=dilation
    )
