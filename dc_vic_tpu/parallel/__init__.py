from .mesh import (
    best_mesh_size,
    data_parallel_eval,
    data_parallel_step,
    fsdp_sharding_tree,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)
