"""Host-side execution helpers.

The host data pipeline (chip reads, scaling, augmentation, collation) must
never touch the accelerator: on a real TPU host every stray ``jnp`` op in a
loader worker would round-trip PCIe (or, under a tunneled platform, the
network) once per chip. Everything before the per-batch ``device_put`` runs
under ``host_context()`` so jnp ops execute on the always-available CPU
backend.
"""

import functools

import jax


@functools.lru_cache(maxsize=1)
def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover - cpu backend always exists
        return jax.devices()[0]


def host_context():
    """Context manager pinning jnp ops to the host CPU backend."""
    return jax.default_device(cpu_device())


