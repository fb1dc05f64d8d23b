"""Synthetic chip generation for tests and benchmarks.

Mirrors the reference's universal fake-data mechanism
(tests/conftest.py:19-55): random (B, T, H, W, C) series, labels in
{-1, 0, 1, 2} (weak label -1 included), random boundary distances and
geographic bounds.
"""

import typing as T

import jax.numpy as jnp
import numpy as np

from .batch import Batch


def create_batch(
    num_channels: int = 3,
    num_time: int = 12,
    height: int = 20,
    width: int = 20,
    batch_size: int = 1,
    rng: T.Optional[np.random.Generator] = None,
) -> Batch:
    if rng is None:
        rng = np.random.default_rng(100)

    x = rng.random(
        (batch_size, num_time, height, width, num_channels), dtype=np.float32
    )
    y = rng.integers(low=-1, high=3, size=(batch_size, height, width))
    bdist = rng.random((batch_size, height, width), dtype=np.float32)

    left = rng.uniform(-180, 180, size=batch_size)
    right = left + rng.uniform(0, 1, size=batch_size)
    bottom = rng.uniform(-90, 89, size=batch_size)
    top = bottom + rng.uniform(0, 1, size=batch_size)

    idx = rng.integers(low=0, high=99_999)
    year = int(rng.choice([2020, 2021, 2022, 2023]))

    batch = Batch(
        x=jnp.asarray(x),
        y=jnp.asarray(y, dtype=jnp.int32),
        bdist=jnp.asarray(bdist),
        left=jnp.asarray(left, dtype=jnp.float32),
        bottom=jnp.asarray(bottom, dtype=jnp.float32),
        right=jnp.asarray(right, dtype=jnp.float32),
        top=jnp.asarray(top, dtype=jnp.float32),
        batch_id=tuple(
            f"data_{idx + i:06d}_{year}_none.npz" for i in range(batch_size)
        ),
    )
    return batch.with_centroids()
