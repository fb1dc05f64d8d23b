"""Mixed precision for TPU: bf16 compute, fp32 parameters and reductions.

The reference trains with fp16 AMP ("16-mixed", model.py:86); the TPU-native
equivalent is bfloat16 compute with fp32 master params. Parameters are cast
to bf16 *inside* the differentiated function, so gradients flow back through
the cast and land in fp32 (where the optimizer update happens); batch-norm /
layer-norm statistics stay fp32 (flax computes normalization stats in fp32
regardless of input dtype); the loss is computed from fp32-cast predictions.
"""

import typing as T

import jax
import jax.numpy as jnp

Array = jax.Array


def cast_floating(tree: T.Any, dtype) -> T.Any:
    """Cast all floating-point leaves of a pytree to ``dtype``."""

    def cast(leaf):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)


def resolve_dtype(precision: str):
    if precision in ("bf16", "bfloat16", "16-mixed"):
        return jnp.bfloat16
    if precision in ("fp32", "float32", "32"):
        return jnp.float32
    raise ValueError(f"Unknown precision: {precision!r}")
