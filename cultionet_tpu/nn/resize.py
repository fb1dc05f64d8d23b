"""Bilinear resize with align_corners=True semantics, as dense matmuls.

The reference fixes odd transposed-conv output sizes with
``F.interpolate(mode='bilinear', align_corners=True)``
(nn/functional.py:72-81). On TPU we express the 1-D interpolations as small
dense interpolation matrices applied with einsum — static shapes, MXU-friendly,
and exactly reproducible.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners linear interpolation matrix."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        mat[:, 0] = 1.0
        return mat
    coords = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (coords - lo).astype(np.float32)
    mat[np.arange(out_size), lo] = 1.0 - frac
    mat[np.arange(out_size), lo + 1] += frac
    return mat


def resize_bilinear_align_corners(x: Array, size) -> Array:
    """Resize NHWC ``x`` to spatial ``size=(H, W)`` (align_corners=True)."""
    out_h, out_w = int(size[0]), int(size[1])
    _, in_h, in_w, _ = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    if in_h != out_h:
        mat_h = jnp.asarray(_interp_matrix(out_h, in_h), dtype=x.dtype)
        x = jnp.einsum("hi,biwc->bhwc", mat_h, x)
    if in_w != out_w:
        mat_w = jnp.asarray(_interp_matrix(out_w, in_w), dtype=x.dtype)
        x = jnp.einsum("wj,bhjc->bhwc", mat_w, x)
    return x
