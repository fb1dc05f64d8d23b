from .mesh import (
    batch_sharding,
    create_mesh,
    fsdp_state_sharding,
    replicate_state,
    replicated,
    shard_batch,
    shard_state_fsdp,
)
from .sharded import (
    make_sharded_eval_step,
    make_sharded_predict_step,
    make_sharded_train_step,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "fsdp_state_sharding",
    "make_sharded_eval_step",
    "make_sharded_predict_step",
    "make_sharded_train_step",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_state_fsdp",
]
