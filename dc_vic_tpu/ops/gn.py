"""Streaming GroupNorm statistics (Pallas TPU kernel / lane-preserving XLA).

The reconstruction graph spends ~45% of its device time in the GroupNorm
stat reductions when they run through XLA's generic reduce lowering
(`convert_reduce_fusion`, ~219 ms of a 484 ms graph at Kodak 768x512
batch 16 — scripts/trace_probe.py). XLA reduces [B,H,W,G,C/G] straight to
[B,G]: the minor (lane) dimension collapses to C/G = 4..16 of 128 lanes,
so the pass runs at a fraction of HBM bandwidth.

Two TPU-native lowerings of the same math, selected by DCVIC_GN (read at
trace time):
  - "xla2" (default): per-(image, channel) sums via a lane-preserving XLA
    reduce over the spatial axes only ([B,H,W,C] -> [B,C], all 128 lanes
    live), then a tiny [B,C] -> [B,G] combine. Stays inside XLA's fusion
    machinery — no custom-call boundary, so producer/consumer fusions are
    untouched.
  - "pallas": a custom kernel streaming row tiles of the 4D NHWC tensor
    once, accumulating f32 (sum, sum^2) in a VMEM-resident [8, C] block.
    Fastest standalone (264 GB/s vs flax's in-graph 42-167 GB/s at the
    hot shapes, scripts/gn_microbench.py), but the custom-call boundary
    forces layout copies and de-fuses the surrounding conv chain when
    used in-graph (+90 ms on the recon graph — trace_probe.py), so it is
    NOT the default inside big graphs.
  - "flax": defer to flax.linen.GroupNorm (the baseline for A/Bs).

Semantics match flax.linen.GroupNorm with use_fast_variance=True: f32
accumulation, Var = E[x^2] - E[x]^2 clipped at zero (flax
normalization._compute_stats). The reference applies torch GroupNorm in
its VQGAN decoder (ref: ldm/modules/diffusionmodules/model.py:35-37);
these are TPU-native lowerings of the same math.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-input-block VMEM budget (double-buffered by the pipeline, and the
# f32 upcast of the block lives in registers/VMEM alongside it).
_BLOCK_BYTES = 2 * 1024 * 1024


def gn_mode() -> str:
    """GN lowering: DCVIC_GN in {xla2, pallas, flax}; default xla2."""
    return os.environ.get("DCVIC_GN", "xla2")


def _gn_stats_kernel(x_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)                       # [T, W, C]
    x = x.reshape(-1, x.shape[-1])                         # [T*W, C]
    s = jnp.sum(x, axis=0, keepdims=True)                  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    part = jnp.concatenate(
        [s, s2, jnp.zeros((6, x.shape[1]), jnp.float32)], axis=0)  # [8, C]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[0] += part


def _h_tile(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest row-tile T dividing h with T*W*C*itemsize <= _BLOCK_BYTES."""
    cap = max(_BLOCK_BYTES // (w * c * itemsize), 1)
    t = 1
    while h % (t * 2) == 0 and t * 2 <= cap:
        t *= 2
    if h % (t * 3) == 0 and t * 3 <= cap:
        t *= 3
    return t


def _use_pallas(h: int, w: int, c: int, itemsize: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return (c % 128 == 0 and w * c * itemsize <= _BLOCK_BYTES
            and h * w >= 2048)


def channel_sums(x: jnp.ndarray) -> jnp.ndarray:
    """Per-(image, channel) [sum, sum^2] of x [B, ..., C], f32 [B, 2, C].
    Lane-preserving: the reduction never collapses the channel axis."""
    B, C = x.shape[0], x.shape[-1]
    use_pallas = (gn_mode() == "pallas" and x.ndim == 4
                  and _use_pallas(x.shape[1], x.shape[2], C,
                                  x.dtype.itemsize))
    if not use_pallas:
        xf = x.reshape(B, -1, C).astype(jnp.float32)
        s = jnp.stack([jnp.sum(xf, axis=1), jnp.sum(xf * xf, axis=1)],
                      axis=1)
        # Without the barrier XLA merges this lane-preserving reduce with
        # the downstream [B,C] -> [B,G] group combine into one reduce whose
        # minor dim is C/G = 4..16 lanes — the exact 42-167 GB/s lowering
        # this path exists to avoid (trace3 vs trace5, docs/PERF.md §12).
        return jax.lax.optimization_barrier(s)
    _, H, W, _ = x.shape
    T = _h_tile(H, W, C, x.dtype.itemsize)
    out = pl.pallas_call(
        _gn_stats_kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
    )(x)
    return out[:, :2, :]


def _gn_apply_kernel(x_ref, sb_ref, out_ref, *, act: str):
    x = x_ref[0].astype(jnp.float32)                       # [T, W, C]
    y = x * sb_ref[0, 0] + sb_ref[0, 1]                    # bcast [C]
    if act == "swish":
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


def _apply_affine(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  act: str | None) -> jnp.ndarray:
    """y = act(x * scale[b,c] + bias[b,c]) in f32, cast back to x.dtype.

    On TPU at kernel-friendly 4D shapes this runs as a Pallas elementwise
    kernel: paired with the stats kernel it removes ALL GroupNorm work
    from XLA's fusion planning — leaving a plain bf16 buffer for the
    consumer convs. (Leaving the affine to XLA next to the stats custom
    call de-fused the surrounding conv chain for +90..220 ms on the recon
    graph — docs/PERF.md §12.)"""
    B, C = x.shape[0], x.shape[-1]
    if (x.ndim == 4 and gn_mode() == "pallas"
            and _use_pallas(x.shape[1], x.shape[2], C, x.dtype.itemsize)):
        _, H, W, _ = x.shape
        T = _h_tile(H, W, C, x.dtype.itemsize)
        sb = jnp.stack([scale, bias], axis=1)              # [B, 2, C]
        return pl.pallas_call(
            functools.partial(_gn_apply_kernel, act=act or "none"),
            grid=(B, H // T),
            in_specs=[
                pl.BlockSpec((1, T, W, C), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, W, C), lambda b, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, sb)
    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = (x.astype(jnp.float32) * scale.reshape(bshape)
         + bias.reshape(bshape))
    if act == "swish":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def gn_stats(x: jnp.ndarray, num_groups: int):
    """(mean, var) per (image, group) of x [B, ..., C], both [B, G] f32.
    Fast variance, clipped at zero (flax parity)."""
    B, C = x.shape[0], x.shape[-1]
    if gn_mode() == "flax":
        # The original lowering (reduce collapses the lane axis) — kept as
        # the A/B baseline; numerically identical math.
        xg = x.reshape(B, -1, num_groups, C // num_groups).astype(
            jnp.float32)
        mean = jnp.mean(xg, axis=(1, 3))
        var = jnp.maximum(
            jnp.mean(xg * xg, axis=(1, 3)) - mean * mean, 0.0)
        return mean, var
    n = (x.size // (B * C)) * (C // num_groups)
    sums = channel_sums(x)                                  # [B, 2, C]
    g = sums.reshape(B, 2, num_groups, C // num_groups).sum(axis=-1)
    mean = g[:, 0] / n
    var = jnp.maximum(g[:, 1] / n - mean * mean, 0.0)
    return mean, var


@functools.partial(jax.jit, static_argnames=("num_groups", "epsilon", "act"))
def group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               num_groups: int, epsilon: float = 1e-6,
               act: str | None = None) -> jnp.ndarray:
    """GroupNorm over (spatial, within-group C) of x [B, ..., C], with an
    optional fused activation (act='swish'); returns x.dtype. Stats via
    channel_sums; the apply folds to a per-(image, channel) affine."""
    B, C = x.shape[0], x.shape[-1]
    mean, var = gn_stats(x, num_groups)                     # [B, G]
    inv = jax.lax.rsqrt(var + epsilon)
    rep = lambda a: jnp.broadcast_to(
        a[:, :, None], (B, num_groups, C // num_groups)).reshape(B, C)
    scale = gamma.astype(jnp.float32)[None, :] * rep(inv)
    bias = beta.astype(jnp.float32)[None, :] - rep(mean) * scale
    return _apply_affine(x, scale, bias, act)
