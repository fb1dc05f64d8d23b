"""Weight initializers mirroring the reference's init scheme.

Reference (layers/weights.py:24-39): Kaiming-normal (fan_in, a=0) conv/linear
kernels, standard-normal biases, BatchNorm scale ~ N(1, 0.02), zero BN bias.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal over fan_in (matches torch kaiming_normal_(a=0, mode='fan_in')).
kaiming_normal = nn.initializers.variance_scaling(
    2.0, mode="fan_in", distribution="normal"
)


def normal_bias(key, shape, dtype=jnp.float32):
    """Standard-normal bias init (reference nn.init.normal_ default)."""
    return jax.random.normal(key, shape, dtype)


def batchnorm_scale(key, shape, dtype=jnp.float32):
    """BatchNorm scale ~ N(1, 0.02)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)
