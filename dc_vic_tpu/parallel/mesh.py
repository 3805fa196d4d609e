"""Device mesh + SPMD data parallelism.

The reference is single-GPU (ref: README.md:64-65 — "Currently, only
single-GPU is supported"); the TPU build's first-class parallelism is
data-parallel SPMD over a 1-D device mesh: parameters replicated, the batch
axis sharded, XLA inserting the gradient all-reduce over ICI (GSPMD — no
hand-written collectives needed for dp). The same helpers drive multi-chip
eval sweeps (each image independent).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def best_mesh_size(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest device count that evenly divides the global batch."""
    n = n_devices or len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return max(1, n)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard the leading (batch) axis of each array leaf across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree.map(put, tree)


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       axis: str = DATA_AXIS) -> Callable:
    """Wrap a (state, batch) -> (state, metrics) step for SPMD dp execution:
    state replicated, batch sharded on its leading axis. XLA partitions the
    graph and inserts the cross-chip reductions (grad all-reduce) over ICI.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def data_parallel_eval(fn: Callable, mesh: Mesh, axis: str = DATA_AXIS
                       ) -> Callable:
    """Wrap (params, batch, *consts) -> outputs for dp eval sweeps."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def wrapper(params, batch, *args):
        params = jax.device_put(params, repl)
        batch = jax.device_put(batch, data)
        return jax.jit(fn)(params, batch, *args)
    return wrapper
