"""Pallas 3x3 same-padding NHWC convolution for the reconstruction stacks.

Why this exists: the decode/reconstruction graphs are dominated by 3x3
convs on big spatial planes (VQGAN decoder stages at 512/512/256/128
channels, ref: ldm/modules/diffusionmodules/model.py:462-568; ELIC decoder,
ref: src/models/subnet/autoencoder/elic_autoencoder.py:74-118). XLA's conv
lowering was measured at ~40% of the v5e MXU peak on the dominant shapes
(docs/PERF.md section 5), and nothing on these paths requires bit-exactness
(only the hyperdecoder->ChARM mu/sigma path is pinned), so they are fair
game for a faster kernel.

Design (TPU-first, not an im2col translation):
  * the conv is 9 shifted [.., C] @ [C, Cout] matmuls accumulated in f32 —
    keeps everything on the MXU with zero patch materialization in HBM;
  * grid over (batch, row-tiles); each step manually DMAs a haloed row tile
    [TILE_H+2, W+2, C] from HBM into a double-buffered VMEM scratch, so
    overlapping halos never touch HBM twice via XLA pads/concats;
  * weights [3, 3, C, Cout] live whole in VMEM (<= 4.7 MB at 512x512);
  * accumulation in f32 regardless of input dtype (bf16 inputs use the MXU
    bf16 path with f32 accumulate via preferred_element_type).

scripts/conv_microbench.py holds the committed measurements against XLA's
lowering at the four hot shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(H: int, W: int, C: int, Cout: int, dtype,
                 n_side_blocks: int = 0, f32_prologue: bool = False) -> int:
    """Largest row-tile that divides H and fits ALL resident VMEM buffers:
    double-buffered input tile, f32 accumulator, whole weights, the
    double-buffered pipelined output block, n_side_blocks extra pipelined
    per-tile inputs (e.g. the fused residual), and - for the fused variant -
    the f32 affine+swish intermediate over the haloed tile."""
    bpe = jnp.dtype(dtype).itemsize
    budget = 11 * 1024 * 1024  # of 16 MB/core; headroom for Mosaic spills
    weights = 9 * C * Cout * bpe
    best = 1
    for t in (64, 32, 16, 8, 4, 2, 1):
        if H % t:
            continue
        scratch = 2 * (t + 2) * (W + 2) * C * bpe      # double-buffered tile
        acc = t * W * Cout * 4                          # f32 accumulator
        out = 2 * t * W * Cout * bpe * (1 + n_side_blocks)
        pro = (t + 2) * (W + 2) * C * (4 + bpe) if f32_prologue else 0
        if weights + scratch + acc + out + pro <= budget:
            best = t
            break
    return best


def _conv_kernel(w_ref, xp_hbm, o_ref, xt, sem, *, tile_h, W, C, Cout,
                 n_rows, dxcat=False):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # DMA whole (tile_h+2, Wpad, C) blocks: Wpad is tiling-aligned, so no
    # unaligned memref slices (Mosaic requires sublane-dim slice alignment).
    def tile_dma(slot, bb, ii):
        return pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(ii * tile_h, tile_h + 2)],
            xt.at[slot],
            sem.at[slot],
        )

    # double-buffer parity follows the GLOBAL step index (grid iterates
    # row-tiles fastest): with per-batch parity, odd n_rows would desync the
    # producer/consumer slots across batch elements.
    g = b * n_rows + i
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    # warm-up: ONLY the very first grid step starts its own DMA — every
    # other step's tile was prefetched by its predecessor (including across
    # batch elements); a second start here would leak an un-waited DMA and
    # wedge the chip for subsequent programs.
    @pl.when((b == 0) & (i == 0))
    def _():
        tile_dma(slot, b, i).start()

    # prefetch the next tile (possibly of the next batch element)
    nb = jax.lax.select(i + 1 < n_rows, b, b + 1)
    ni = jax.lax.select(i + 1 < n_rows, i + 1, 0)

    @pl.when(nb < pl.num_programs(0))
    def _():
        tile_dma(nslot, nb, ni).start()

    tile_dma(slot, b, i).wait()

    xv = xt[slot]  # value-level: shifted reads lower to vector relayouts
    acc = jnp.zeros((tile_h, W, Cout), jnp.float32)
    if dxcat:
        # 3 matmuls with K=3C instead of 9 with K=C: deeper contractions
        # amortize MXU pipeline overhead on thin-channel shapes (C=128).
        # Weights arrive pre-concatenated as [3, 3C, Cout].
        for dy in range(3):
            xs = jnp.concatenate(
                [jax.lax.slice(xv, (dy, dx, 0), (dy + tile_h, dx + W, C))
                 for dx in range(3)], axis=-1)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(xv, (dy, dx, 0),
                                   (dy + tile_h, dx + W, C))
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[0] = acc.astype(o_ref.dtype)


def _xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@jax.custom_vjp
def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC x [B,H,W,C] against HWIO w [3,3,C,Cout],
    f32 accumulation. Drop-in for lax.conv_general_dilated on the hot
    reconstruction shapes. Differentiable: the backward pass delegates to
    XLA's own conv gradients (the kernel only accelerates the forward; the
    codec paths that use it never differentiate, and training paths that
    might are correct either way)."""
    return _conv3x3_fwd_impl(x, w)


def _conv3x3_vjp_fwd(x, w):
    return _conv3x3_fwd_impl(x, w), (x, w)


def _conv3x3_vjp_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(_xla_conv3x3, x, w)
    return vjp(g.astype(x.dtype))


conv3x3_same.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("out_dtype", "dxcat"))
def _conv3x3_fwd_impl(x: jnp.ndarray, w: jnp.ndarray,
                      out_dtype=None, dxcat: bool = None) -> jnp.ndarray:
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), w.shape
    out_dtype = out_dtype or x.dtype
    if dxcat is None:
        import os
        dxcat = os.environ.get("DCVIC_CONV3_DXCAT") == "1"
    tile_h = _pick_tile_h(H, W, C, Cout, x.dtype)
    n_rows = H // tile_h

    # W padded so VMEM tile blocks are sublane-tiling aligned (16 covers
    # bf16's (16,128) tile; extra right-pad columns are never read).
    wpad = -(-(W + 2) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - W - 1), (0, 0)))
    if dxcat:
        w = w.reshape(3, 3 * C, Cout)  # [dy, dx*C + c, o], dx-major

    kernel = functools.partial(
        _conv_kernel, tile_h=tile_h, W=W, C=C, Cout=Cout, n_rows=n_rows,
        dxcat=dxcat)

    flops = 2 * B * H * W * 9 * C * Cout
    bytes_accessed = (xp.size * xp.dtype.itemsize + w.size * w.dtype.itemsize
                      + B * H * W * Cout * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=(B, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded input, HBM
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wpad, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(w, xp)


# ---------------------------------------------------------------------------
# Fused GroupNorm-affine + swish + conv3x3 + bias + residual
#
# Round 3's in-graph A/B showed the plain Pallas conv LOSES to XLA despite a
# 1.33-1.66x standalone win: each pallas_call is a fusion barrier, and XLA
# folds the surrounding GroupNorm/swish/residual elementwise chains into its
# conv epilogues (docs/PERF.md section 5). This variant moves those chains
# INSIDE the kernel: the tile is read raw from HBM, the per-(batch, channel)
# GN affine (stats folded on the XLA side into scale/bias) and swish run in
# VMEM as the matmul prologue, and conv bias + residual add run as the
# epilogue — so the kernel keeps the MXU win without giving XLA any unfused
# elementwise passes over the big plane.
# ---------------------------------------------------------------------------


def _fused_kernel(w_ref, scale_ref, bias_ref, cb_ref, xp_hbm, res_ref, o_ref,
                  xt, sem, *, tile_h, H, W, C, Cout, n_rows, has_res,
                  compute_dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def tile_dma(slot, bb, ii):
        return pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(ii * tile_h, tile_h + 2)],
            xt.at[slot],
            sem.at[slot],
        )

    g = b * n_rows + i
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when((b == 0) & (i == 0))
    def _():
        tile_dma(slot, b, i).start()

    nb = jax.lax.select(i + 1 < n_rows, b, b + 1)
    ni = jax.lax.select(i + 1 < n_rows, i + 1, 0)

    @pl.when(nb < pl.num_programs(0))
    def _():
        tile_dma(nslot, nb, ni).start()

    tile_dma(slot, b, i).wait()

    th, wpad = tile_h + 2, xt.shape[2]
    # prologue: per-(batch, channel) affine (folded GN stats) + swish, f32
    xv = xt[slot].astype(jnp.float32)
    xv = xv * scale_ref[b] + bias_ref[b]
    xv = xv * jax.nn.sigmoid(xv)
    # SAME-conv zero padding lives in the NORMALIZED space: the affine+swish
    # turned the halo zeros into swish(bias) != 0, so re-zero every position
    # outside the [0, H) x [0, W) image (top/bottom halo rows of the edge
    # tiles, the left/right halo columns, and the alignment pad columns).
    row = jax.lax.broadcasted_iota(jnp.int32, (th, wpad, 1), 0) \
        + i * tile_h - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (th, wpad, 1), 1) - 1
    valid = (row >= 0) & (row < H) & (col >= 0) & (col < W)
    xv = jnp.where(valid, xv, 0.0).astype(compute_dtype)

    acc = jnp.zeros((tile_h, W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xv, (dy, dx, 0), (dy + tile_h, dx + W, C))
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + cb_ref[0]
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _xla_fused_ref(x, w, scale, bias, cbias, res):
    """XLA reference of the fused composite (used for the backward pass and
    as the CPU/non-qualifying fallback)."""
    h = x.astype(jnp.float32) * scale[:, None, None, :] \
        + bias[:, None, None, :]
    h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + cbias.astype(jnp.float32)
    if res is not None:
        y = y + res.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_gn_swish(x, w, scale, bias, cbias, res):
    """Fused y = conv3x3_same(swish(x * scale[b] + bias[b]), w) + cbias
    (+ res). x [B,H,W,C]; w [3,3,C,Cout] HWIO; scale/bias [B,C] f32 (GN
    stats and gamma/beta folded per batch element); cbias [Cout]; res
    [B,H,W,Cout] or None. Backward delegates to XLA's gradients of the same
    composite (the codec decode paths never differentiate)."""
    return _fused_fwd_impl(x, w, scale, bias, cbias, res)


def _fused_vjp_fwd(x, w, scale, bias, cbias, res):
    return _fused_fwd_impl(x, w, scale, bias, cbias, res), \
        (x, w, scale, bias, cbias, res)


def _fused_vjp_bwd(saved, g):
    x, w, scale, bias, cbias, res = saved
    if res is None:
        out, vjp = jax.vjp(
            lambda *a: _xla_fused_ref(*a, None), x, w, scale, bias, cbias)
        return vjp(g.astype(x.dtype)) + (None,)
    _, vjp = jax.vjp(_xla_fused_ref, x, w, scale, bias, cbias, res)
    return vjp(g.astype(x.dtype))


conv3x3_gn_swish.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _fused_fwd_impl(x, w, scale, bias, cbias, res):
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), w.shape
    assert scale.shape == (B, C) and bias.shape == (B, C)
    has_res = res is not None
    tile_h = _pick_tile_h(H, W, C, Cout, x.dtype,
                          n_side_blocks=1 if has_res else 0,
                          f32_prologue=True)
    n_rows = H // tile_h

    wpad = -(-(W + 2) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - W - 1), (0, 0)))
    scale = scale.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    cbias = cbias.astype(jnp.float32).reshape(1, Cout)

    kernel = functools.partial(
        _fused_kernel, tile_h=tile_h, H=H, W=W, C=C, Cout=Cout,
        n_rows=n_rows, has_res=has_res, compute_dtype=x.dtype)

    flops = 2 * B * H * W * 9 * C * Cout
    bytes_accessed = (xp.size * xp.dtype.itemsize
                      + w.size * w.dtype.itemsize
                      + B * H * W * Cout * x.dtype.itemsize
                      * (2 if has_res else 1))
    block = pl.BlockSpec((1, tile_h, W, Cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    res_spec = block if has_res else pl.BlockSpec(memory_space=pltpu.VMEM)
    res_arg = res if has_res else jnp.zeros((1, 1), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale [B, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [B, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # conv bias [1, Cout]
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded input, HBM
            res_spec,                                 # residual (pipelined)
        ],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wpad, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=B * H * W * C),
    )(w, scale, bias, cbias, xp, res_arg)
