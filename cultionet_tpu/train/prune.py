"""Magnitude pruning (reference's optional Lightning ModelPruning callback,
callbacks.py:261-269: L1-unstructured)."""


import jax
import jax.numpy as jnp


def l1_unstructured_prune(
    params, amount: float = 0.2, min_size: int = 32
):
    """Zero the smallest-|w| fraction ``amount`` of each weight tensor
    (biases and tiny tensors skipped)."""

    def prune(leaf):
        if not isinstance(leaf, jax.Array):
            return leaf
        if leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        k = int(leaf.size * amount)
        if k == 0:
            return leaf
        threshold = jnp.sort(jnp.abs(leaf).reshape(-1))[k - 1]
        return jnp.where(jnp.abs(leaf) <= threshold, 0.0, leaf)

    return jax.tree_util.tree_map(prune, params)


def sparsity(params) -> float:
    """Fraction of zero weights across all float parameters."""
    zeros = total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            zeros += int(jnp.sum(leaf == 0))
            total += leaf.size
    return zeros / max(total, 1)
