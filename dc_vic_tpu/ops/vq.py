"""Fused nearest-codeword search (Pallas TPU kernel with XLA fallback).

The reference's VQ lookup is an expanded-L2 argmin in torch
(ref: taming/modules/vqvae/quantize.py:271-312). Here the distance
computation + argmin is a single fused Pallas kernel: one VMEM-resident
codebook tile, MXU matmul for the cross term, VPU argmin — no [M, N]
distance matrix ever hits HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 1024


def _vq_kernel(z_ref, cb_ref, cb_sq_ref, idx_ref):
    z = z_ref[:].astype(jnp.float32)              # [TILE_M, D]
    cb = cb_ref[:].astype(jnp.float32)            # [N, D]
    # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; ||z||^2 constant over argmin.
    cross = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)  # [TILE_M, N]
    dist = cb_sq_ref[:] - 2.0 * cross
    idx_ref[:] = jnp.argmin(dist, axis=-1).astype(jnp.int32)[:, None]


def _vq_argmin_xla(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback (also the off-chip reference the kernel is tested
    against in tests/test_kernels.py)."""
    cross = jnp.dot(z_flat.astype(jnp.float32), codebook.T.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    dist = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None] - 2.0 * cross
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def _vq_argmin_pallas(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """The fused kernel path (unjitted so tests can run it through the
    Pallas interpreter on CPU)."""
    M, D = z_flat.shape
    N = codebook.shape[0]
    pad_m = (-M) % _TILE_M
    zp = jnp.pad(z_flat, ((0, pad_m), (0, 0)))
    cb_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]  # [1, N]

    grid = (zp.shape[0] // _TILE_M,)
    idx = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((zp.shape[0], 1), jnp.int32),
    )(zp, codebook, cb_sq)
    return idx[:M, 0]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def vq_argmin(z_flat: jnp.ndarray, codebook: jnp.ndarray,
              use_pallas: bool = True) -> jnp.ndarray:
    """Nearest codebook index for each row of z_flat.

    z_flat: [M, D] float; codebook: [N, D]. Returns [M] int32.
    """
    if not use_pallas or jax.default_backend() != "tpu":
        return _vq_argmin_xla(z_flat, codebook)
    return _vq_argmin_pallas(z_flat, codebook)
