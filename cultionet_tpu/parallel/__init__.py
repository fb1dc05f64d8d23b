from .mesh import (
    batch_sharding,
    create_mesh,
    fsdp_param_sharding,
    replicate_state,
    replicated,
    shard_batch,
)
from .sharded import (
    make_sharded_eval_step,
    make_sharded_predict_step,
    make_sharded_train_step,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "fsdp_param_sharding",
    "make_sharded_eval_step",
    "make_sharded_predict_step",
    "make_sharded_train_step",
    "replicate_state",
    "replicated",
    "shard_batch",
]
