from .mesh import (
    best_mesh_size,
    data_parallel_eval,
    data_parallel_step,
    make_mesh,
    replicate,
    shard_batch,
)
