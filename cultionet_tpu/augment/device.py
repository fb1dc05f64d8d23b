"""On-device batched augmentation, fused into the jitted train step.

The reference augments per sample in DataLoader workers (datasets.py:449-478);
here the geometric + noise subset runs ON the accelerator as part of the
compiled step: each sample draws one of the 8 dihedral transforms
(rot90/180/270 x flip — the exact subgroup the reference's rot/flip
augmenters cover) plus optional additive noise. Zero host cost, zero extra
HBM traffic beyond the batch itself. Parcel-wise temporal warps remain
host-side (data-dependent segmentation).

Requires square chips (H == W) for the rotation branches.
"""

import typing as T

import jax
import jax.numpy as jnp

from ..data.batch import Batch

Array = jax.Array


def _apply_one(x: Array, y: Array, bdist: Array, code: Array):
    """Apply dihedral transform ``code`` in [0, 8) to one sample.

    x: (T, H, W, C); y, bdist: (H, W).
    """

    def make_branch(k_rot: int, flip: bool):
        def branch(operands):
            x_, y_, b_ = operands
            if flip:
                x_ = jnp.flip(x_, axis=2)
                y_ = jnp.flip(y_, axis=1)
                b_ = jnp.flip(b_, axis=1)
            if k_rot:
                x_ = jnp.rot90(x_, k=k_rot, axes=(1, 2))
                y_ = jnp.rot90(y_, k=k_rot, axes=(0, 1))
                b_ = jnp.rot90(b_, k=k_rot, axes=(0, 1))
            return x_, y_, b_

        return branch

    branches = [
        make_branch(k, flip) for flip in (False, True) for k in range(4)
    ]
    return jax.lax.switch(code, branches, (x, y, bdist))


def augment_batch_on_device(
    batch: Batch,
    key: Array,
    dihedral: bool = True,
    noise_sigma: float = 0.0,
) -> Batch:
    """Per-sample random dihedral transform + optional gaussian noise,
    fully jit-able. No-op fields (y/bdist None) pass through."""
    if not dihedral and noise_sigma <= 0:
        return batch

    x, y, bdist = batch.x, batch.y, batch.bdist
    num = x.shape[0]
    key_code, key_noise = jax.random.split(key)

    if dihedral:
        assert x.shape[2] == x.shape[3], (
            "device dihedral augmentation needs square chips"
        )
        codes = jax.random.randint(key_code, (num,), 0, 8)
        y_in = y if y is not None else jnp.zeros(x.shape[:1] + x.shape[2:4], jnp.int32)
        b_in = (
            bdist
            if bdist is not None
            else jnp.zeros(x.shape[:1] + x.shape[2:4], x.dtype)
        )
        x, y_out, b_out = jax.vmap(_apply_one)(x, y_in, b_in, codes)
        y = y_out if y is not None else None
        bdist = b_out if bdist is not None else None

    if noise_sigma > 0:
        # No clipping: inputs may be z-scored (unbounded) at this point.
        x = x + noise_sigma * jax.random.normal(
            key_noise, x.shape, dtype=x.dtype
        )

    return batch.replace(x=x, y=y, bdist=bdist)
