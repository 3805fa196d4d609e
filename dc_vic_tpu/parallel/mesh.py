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
    """Fully replicate a pytree across the mesh, into FRESH buffers.

    A jitted identity (not ``jax.device_put``) on purpose: device_put may
    zero-copy alias the source buffers (it does on the CPU backend), and
    the replicated state is donated by ``data_parallel_step`` — donating
    an aliased buffer would delete the caller's original arrays out from
    under it. The jit guarantees distinct output buffers, so the source
    tree stays valid after the replicated copy is consumed.
    """
    sharding = NamedSharding(mesh, P())
    with jax.transfer_guard("allow"):
        return jax.jit(lambda t: t, out_shardings=sharding)(tree)


def fsdp_sharding_tree(tree: Any, mesh: Mesh, axis: str = DATA_AXIS,
                       min_size: int = 1 << 14) -> Any:
    """Per-leaf NamedShardings implementing ZeRO-3-style fully-sharded data
    parallelism via GSPMD: every leaf with >= min_size elements is sharded
    on its largest mesh-divisible dimension; small leaves (scalars, norm
    params, rng keys) stay replicated. With these as the train state's
    in/out shardings, params and both optimizer moments live SHARDED in
    HBM (1/n per chip); XLA inserts the all-gather at each parameter use
    and reduce-scatters the gradients — no hand-written collectives.
    """
    n = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        if not shape or int(np.prod(shape)) < min_size:
            return repl
        best_dim, best = -1, 0
        for d, s in enumerate(shape):
            if s % n == 0 and s > best:
                best_dim, best = d, s
        if best_dim < 0:
            return repl
        spec = [None] * len(shape)
        spec[best_dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, tree)


def shard_state(tree: Any, mesh: Mesh, shardings: Any) -> Any:
    """Place a state pytree according to `shardings`, into fresh buffers
    (jitted identity — same donation-safety rationale as `replicate`)."""
    with jax.transfer_guard("allow"):
        return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard the leading (batch) axis of each array leaf across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree.map(put, tree)


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       axis: str = DATA_AXIS,
                       state_shardings: Any = None) -> Callable:
    """Wrap a (state, batch) -> (state, metrics) step for SPMD dp execution:
    state replicated (or FSDP-sharded when `state_shardings` from
    `fsdp_sharding_tree` is given), batch sharded on its leading axis. XLA
    partitions the graph and inserts the cross-chip collectives (grad
    all-reduce; param all-gather + grad reduce-scatter under FSDP) over ICI.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    state = repl if state_shardings is None else state_shardings
    # donate the train state: params + two optimizer moments are the
    # dominant HBM residents, and without donation XLA keeps the old and
    # new state live across the step (an extra full copy + copy traffic)
    return jax.jit(
        step_fn,
        in_shardings=(state, data),
        out_shardings=(state, repl),
        donate_argnums=(0,),
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
