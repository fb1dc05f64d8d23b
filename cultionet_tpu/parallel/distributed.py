"""Multi-host initialization and pod-slice topology helpers.

Single-program multi-host training (the scale-out beyond one host's chips):
call ``initialize_distributed()`` once per process before any jax use; the
mesh utilities in parallel/mesh.py then span the global device set and GSPMD
routes collectives over ICI within a slice (DCN across slices). This replaces
the reference's Lightning DDP rank-spawn model (model.py:179-185) with JAX's
native coordinator-based runtime.
"""

import typing as T

import jax


def initialize_distributed(
    coordinator_address: T.Optional[str] = None,
    num_processes: T.Optional[int] = None,
    process_id: T.Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-based auto-detection (TPU pods
    populate the arguments automatically)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def topology_summary() -> dict:
    """Global/local device census for logging and sanity checks."""
    devices = jax.devices()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_device_count": len(devices),
        "local_device_count": jax.local_device_count(),
        "platform": devices[0].platform if devices else "none",
    }


def assert_same_across_hosts(value: int, name: str = "value") -> None:
    """Cross-host agreement check (e.g. steps_per_epoch must match so the
    SPMD epoch loops stay in lockstep)."""
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(np.asarray([value]))
    ).reshape(-1)
    if not (gathered == gathered[0]).all():  # pragma: no cover
        raise ValueError(f"{name} differs across hosts: {gathered}")
