"""Activation registry (reference: nn/modules/activations.py:5-24)."""

import typing as T

import jax
import jax.numpy as jnp

Array = jax.Array

_ACTIVATIONS: T.Dict[str, T.Callable[[Array], Array]] = {
    "SiLU": jax.nn.silu,
    "ReLU": jax.nn.relu,
    "GELU": jax.nn.gelu,
    "ELU": jax.nn.elu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def get_activation(name: str) -> T.Callable[[Array], Array]:
    try:
        return _ACTIVATIONS[name]
    except KeyError as e:
        raise ValueError(
            f"Unknown activation {name!r}; choose from {sorted(_ACTIVATIONS)}"
        ) from e
