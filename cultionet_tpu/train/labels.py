"""Label derivation from raw chip labels.

Reference semantics (lightning.py:162-207): y encodes -1 = unlabeled (weak
supervision), 0 = background, 1..edge_class-1 = crop classes, edge_class =
field boundary. The weak-supervision mask is *always* computed here (all-ones
when no -1 pixels exist, which is numerically identical to the reference's
data-dependent branch and keeps the step jit-compatible).
"""

import typing as T

import jax
import jax.numpy as jnp

from ..enums import ValidationNames

Array = jax.Array


def get_true_labels(
    y: Array, edge_class: int = 2
) -> T.Dict[str, Array]:
    true_edge = (y == edge_class).astype(jnp.int32)
    true_crop = ((y > 0) & (y < edge_class)).astype(jnp.int32)
    true_crop_and_edge = (y > 0).astype(jnp.int32)
    true_crop_or_edge = jnp.where(
        (y > 0) & (y < edge_class),
        1,
        jnp.where(y == edge_class, 2, 0),
    ).astype(jnp.int32)
    mask = (y != -1).astype(jnp.int32)

    return {
        ValidationNames.TRUE_EDGE: true_edge,
        ValidationNames.TRUE_CROP: true_crop,
        ValidationNames.TRUE_CROP_AND_EDGE: true_crop_and_edge,
        ValidationNames.TRUE_CROP_OR_EDGE: true_crop_or_edge,
        ValidationNames.MASK: mask,
    }
