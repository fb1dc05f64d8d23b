"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's Lightning DDP/NCCL stack
(model.py:101,179-185; SURVEY.md §2.3): a 1-D ``data`` mesh over ICI, batch
sharded along its leading axis, parameters/optimizer state replicated. All
collectives (gradient all-reduce, cross-replica BatchNorm statistics, global
metric reductions) are inserted by GSPMD from the sharding annotations — no
explicit communication code.

TP/PP/SP/EP are intentionally absent, as in the reference (SURVEY.md §2.3):
the model is a small conv net; data parallelism is the only axis that pays.
FSDP-style parameter sharding is available via ``CultionetParams(fsdp=True)``
(wired through ``fit``) for parity with the reference's selectable 'fsdp'
strategy (args.yml:274).
"""

import typing as T

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batch import Batch


def create_mesh(
    num_devices: T.Optional[int] = None,
    axis_name: str = "data",
    devices: T.Optional[T.Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Batch, mesh: Mesh, axis_name: str = "data") -> Batch:
    """Place a host batch on the mesh, batch-axis sharded.

    The per-host double-buffered ``device_put`` is the TPU equivalent of the
    reference's DataLoader worker -> GPU transfer.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), batch
    )


def global_batch_from_local(
    batch: Batch, sharding: NamedSharding
) -> Batch:
    """Assemble GLOBAL sharded arrays from THIS process's local shard.

    Multi-host input assembly: each process loads only its own slice of the
    global batch (batch_size_global / process_count samples — the analogue
    of the reference's per-rank DDP DataLoaders, model.py:179-185) and
    contributes it via ``jax.make_array_from_process_local_data``; the
    result is a global jax.Array addressing every host's shards, directly
    consumable by the sharded train step. Single-process this reduces to a
    plain sharded ``device_put``.
    """
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf)
        ),
        batch,
    )


def replicate_state(state, mesh: Mesh):
    """Replicate a train state (params + opt state) across the mesh."""
    return jax.device_put(state, replicated(mesh))


def _fsdp_leaf_sharding(
    leaf, mesh: Mesh, axis_name: str, min_size: int
) -> NamedSharding:
    """Large tensors shard along their largest mesh-divisible axis; small
    tensors and scalars replicate (ZeRO-3-style parameter+optimizer-state
    sharding over the data axis)."""
    shape = np.shape(leaf)
    size = int(np.prod(shape)) if shape else 1
    if size < min_size:
        return NamedSharding(mesh, P())
    axis_size = mesh.shape[axis_name]
    for dim, extent in sorted(enumerate(shape), key=lambda kv: -kv[1]):
        if extent % axis_size == 0:
            parts: T.List[T.Optional[str]] = [None] * len(shape)
            parts[dim] = axis_name
            return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def fsdp_state_sharding(
    state, mesh: Mesh, axis_name: str = "data", min_size: int = 2**16
):
    """Sharding pytree for a whole TrainState under FSDP: parameters and
    matching optimizer moments sharded, scalars/batch-stats replicated.

    The reference exposes Lightning ``strategy='fsdp'`` (args.yml:274) with
    no custom code; here GSPMD inserts the all-gathers (params, forward/
    backward) and reduce-scatters (grads) from these annotations. Pass the
    result as ``state_shardings`` to the sharded step factories and place
    the state with :func:`shard_state_fsdp`.
    """
    return jax.tree_util.tree_map(
        lambda leaf: _fsdp_leaf_sharding(leaf, mesh, axis_name, min_size),
        state,
    )


def shard_state_fsdp(
    state, mesh: Mesh, axis_name: str = "data", min_size: int = 2**16
):
    """Place a train state on the mesh with FSDP parameter sharding."""
    shardings = fsdp_state_sharding(
        state, mesh, axis_name=axis_name, min_size=min_size
    )
    return jax.device_put(state, shardings), shardings
