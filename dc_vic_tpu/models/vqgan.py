"""Frozen VQGAN prior (f8-n256): encoder, quantizer, decoder-with-fusion-taps.

Rebuilds the vendored latent-diffusion VQModel path the reference depends on
(ref: ldm/models/autoencoder.py:264-282, ldm/modules/diffusionmodules/model.py:368-568,
taming/modules/vqvae/quantize.py:213-312) as flax modules in NHWC. The decoder
exposes SFT fusion injection points keyed 'before_mid' / 'after_mid' /
'block_1_{8,4,2,1}', replacing the reference's inline re-implementation of the
decoder forward (ref: src/models/subnet/vq_fusion_module.py:78-126) with a
first-class tap mechanism — one jitted graph, no Python-side module surgery.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (Conv, FuseSftBlock, GroupNorm, LightFuseSftBlock,
                         num_groups32)
from ..ops.vq import vq_argmin

Dtype = Any


def swish(x):
    return x * nn.sigmoid(x)


class _GNParams(nn.Module):
    """Declares GroupNorm's parameters without computing — used by the fused
    ResnetBlock path so its tree matches nn.GroupNorm's exactly."""
    ch: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.ch,)),
                self.param("bias", nn.initializers.zeros, (self.ch,)))


class _RawConvParams(nn.Module):
    @nn.compact
    def __call__(self, cin, cout, k):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (k, k, cin, cout)),
                self.param("bias", nn.initializers.zeros, (cout,)))


class _ConvParams(nn.Module):
    """Declares layers.Conv's parameter tree (child nn.Conv auto-named
    Conv_0) without computing — fused-path checkpoint parity."""
    cin: int
    cout: int
    k: int = 3

    @nn.compact
    def __call__(self):
        return _RawConvParams(name="Conv_0")(self.cin, self.cout, self.k)


def _gn_fold(x, gamma, beta, groups: int, eps: float = 1e-6):
    """Fold GroupNorm stats + gamma/beta into one per-(batch, channel)
    affine: GN(x) * gamma + beta == x * scale[b] + bias[b]."""
    B, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 3))
    var = jnp.mean(jnp.square(xg - mean[:, None, :, None]), axis=(1, 3))
    inv = jax.lax.rsqrt(var + eps)
    rep = lambda a: jnp.repeat(a, C // groups, axis=1)        # [B,G]->[B,C]
    scale = gamma.astype(jnp.float32)[None, :] * rep(inv)
    bias = beta.astype(jnp.float32)[None, :] - rep(mean) * scale
    return scale, bias


def _use_fused_resblock(x, out_ch: int) -> bool:
    """Gate for the fused GN+swish+conv3x3(+res) Pallas path: opt-in via
    DCVIC_FUSED_RESBLOCK=1, TPU only, lane-aligned wide channels and a big
    spatial plane (same qualification logic as _use_pallas_conv3; this
    variant keeps XLA's epilogue-fusion advantage INSIDE the kernel —
    docs/PERF.md section 5)."""
    import os
    if os.environ.get("DCVIC_FUSED_RESBLOCK") != "1":
        return False
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return False
    B, H, W, C = x.shape
    return (C % 128 == 0 and out_ch % 128 == 0 and C % 32 == 0
            and H % 2 == 0 and W % 2 == 0 and H * W >= 12288
            and B * H * W >= 16384)


class VQResnetBlock(nn.Module):
    """GroupNorm -> swish -> conv, twice, with 1x1 shortcut on channel change."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if _use_fused_resblock(x, self.out_ch):
            return self._fused(x, in_ch)
        h = GroupNorm(num_groups=num_groups32(in_ch), epsilon=1e-6, dtype=self.dtype, act="swish", name="norm1")(x)
        h = Conv(self.out_ch, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(num_groups=num_groups32(self.out_ch), epsilon=1e-6, dtype=self.dtype, act="swish", name="norm2")(h)
        h = Conv(self.out_ch, 3, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = Conv(self.out_ch, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h

    def _fused(self, x, in_ch: int):
        """Same computation via ops/conv3x3.py::conv3x3_gn_swish — the GN
        affine, swish, conv bias, and residual add all run inside the conv
        kernel; only the GN stat reductions stay in XLA. Identical parameter
        tree to the unfused path (checkpoints interchange)."""
        from ..ops.conv3x3 import conv3x3_gn_swish
        g1, b1 = _GNParams(in_ch, name="norm1")()
        k1, cb1 = _ConvParams(in_ch, self.out_ch, 3, name="conv1")()
        g2, b2 = _GNParams(self.out_ch, name="norm2")()
        k2, cb2 = _ConvParams(self.out_ch, self.out_ch, 3, name="conv2")()
        dt = self.dtype or x.dtype
        xc = x.astype(dt)
        s1, o1 = _gn_fold(xc, g1, b1, num_groups32(in_ch))
        h = conv3x3_gn_swish(xc, k1.astype(dt), s1, o1, cb1, None)
        s2, o2 = _gn_fold(h, g2, b2, num_groups32(self.out_ch))
        res = (Conv(self.out_ch, 1, dtype=self.dtype, name="nin_shortcut")(xc)
               if in_ch != self.out_ch else xc)
        return conv3x3_gn_swish(h, k2.astype(dt), s2, o2, cb2, res)


class VQAttnBlock(nn.Module):
    """Single-head full softmax self-attention over all spatial positions."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(num_groups=num_groups32(C), epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = Conv(C, 1, dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = Conv(C, 1, dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = Conv(C, 1, dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        from ..ops.attention import flash_attention
        # f32 operands: measured on-chip at the hot shape [16,6144,512] the
        # kernel runs 11.9 ms in f32 vs 12.6 ms in bf16 (scripts/
        # scan_attn_ab.py) — it is not MXU-bound, so the lower-precision
        # operands buy nothing and cost ~3e-3 relative error. Keep f32
        # regardless of the surrounding conv compute dtype.
        out = flash_attention(
            (q * (C ** -0.5)).astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32)).reshape(B, H, W, C)
        out = Conv(C, 1, dtype=self.dtype, name="proj_out")(out)
        return (x + out).astype(q.dtype)


class Downsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1) padding (torch-parity)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        return nn.Conv(C, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)],
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv (ref: ldm model.py Upsample).

    DCVIC_FOLDED_UPSAMPLE=1 switches to an exact fold: ONE 2x2 conv emitting
    all four output parities, interleaved depth-to-space (on the
    nearest-upsampled grid every 3x3 window covers only a 2x2 block of
    distinct source pixels, so the 3x3 kernel folds to four 2x2 kernels —
    2.25x fewer MACs, no [2H,2W,C] intermediate). OFF by default: measured
    on-chip at bench geometry the whole reconstruction graph is ~4% SLOWER
    with the fold (555.7 vs 532.5 ms) — XLA already fuses the repeat into
    the conv's input indexing, and the fold's four shifted output slices +
    interleave cost more than the saved MACs (same lesson as the Pallas
    conv dispatch, docs/PERF.md section 5). Parameter tree is identical
    either way (conv/Conv_0/{kernel,bias})."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        import os
        B, H, W, C = x.shape
        if os.environ.get("DCVIC_FOLDED_UPSAMPLE", "0") != "1":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return Conv(C, 3, dtype=self.dtype, name="conv")(x)
        kernel, bias = _ConvParams(C, C, 3, name="conv")()
        dt = self.dtype or x.dtype
        # fold in f32 (param dtype) before casting to the compute dtype
        r0 = jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0)  # even rows
        r1 = jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0)  # odd rows
        k4 = jnp.concatenate(
            [jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1)   # even cols
             for kr in (r0, r1)] +
            [jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1)   # odd cols
             for kr in (r0, r1)],
            axis=-1)  # [2, 2, C, 4C] ordered (ee, oe, eo, oo) by (dw, dh)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(dt)
        o = jax.lax.conv_general_dilated(
            xp, k4.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H+1, W+1, 4C]
        # parity (dh, dw) output pixel (2i+dh, 2j+dw) reads padded rows
        # {i+dh, i+1+dh} / cols {j+dw, j+1+dw} = conv output (i+dh, j+dw)
        oee = o[:, :H, :W, 0 * C:1 * C]
        ooe = o[:, 1:, :W, 1 * C:2 * C]
        oeo = o[:, :H, 1:, 2 * C:3 * C]
        ooo = o[:, 1:, 1:, 3 * C:4 * C]
        y = jnp.stack([jnp.stack([oee, oeo], axis=3),
                       jnp.stack([ooe, ooo], axis=3)], axis=2)
        return y.reshape(B, 2 * H, 2 * W, C) + bias.astype(dt)


class VQEncoder(nn.Module):
    """ddconfig encoder: conv_in -> per-level ResnetBlocks(+attn)+Downsample ->
    mid(block, attn, block) -> GN+swish+conv_out (z_channels)."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = Conv(self.ch, 3, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = VQResnetBlock(self.ch * mult, dtype=self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = VQAttnBlock(dtype=self.dtype,
                                    name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = VQResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VQResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)

        h = GroupNorm(num_groups=num_groups32(h.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                      act="swish", name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv(out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class VQDecoder(nn.Module):
    """ddconfig decoder with optional SFT fusion taps.

    Call with cond_feats=None for the plain VQGAN decode, or with a dict of
    conditioning features keyed by fuse_schedule to apply the DC-VIC fusion
    (tap placement per ref: src/models/subnet/vq_fusion_module.py:78-126:
    'before_mid' after conv_in, 'after_mid' after mid, 'block_1_{2^l}' after
    level l's blocks and before its upsample).
    """
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    z_channels: int = 4
    out_ch: int = 3
    tanh_out: bool = False
    give_pre_end: bool = False
    # fusion key -> dict(cond_ch, mid_ch); dec_ch inferred from topology
    fuse_schedule: Optional[Dict[str, Dict[str, int]]] = None
    fuse_type: str = "sft"   # 'sft' | 'light_sft' (ref: vq_fusion_module.py)
    dtype: Optional[Dtype] = None

    def _fuse(self, key: str, h, cond_feats, w, dec_ch: int):
        sched = self.fuse_schedule or {}
        if key not in sched:
            return h
        blk_cls = FuseSftBlock if self.fuse_type == "sft" else LightFuseSftBlock
        blk = blk_cls(dec_ch=dec_ch, mid_ch=sched[key].get("mid_ch", dec_ch),
                      dtype=self.dtype, name=f"fusion_{key}")
        if cond_feats is None or key not in cond_feats:
            raise ValueError(f"fusion key {key!r} scheduled but no cond feature given")
        return blk(h, cond_feats[key], w)

    @nn.compact
    def __call__(self, z, cond_feats: Optional[Dict[str, jnp.ndarray]] = None,
                 w: float = 1.0):
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)

        h = Conv(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = self._fuse("before_mid", h, cond_feats, w, block_in)

        h = VQResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VQResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        h = self._fuse("after_mid", h, cond_feats, w, block_in)

        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VQResnetBlock(block_out, dtype=self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = VQAttnBlock(dtype=self.dtype,
                                    name=f"up_{i_level}_attn_{i_block}")(h)
            h = self._fuse(f"block_1_{2 ** i_level}", h, cond_feats, w, block_out)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = GroupNorm(num_groups=num_groups32(h.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                      act="swish", name="norm_out")(h)
        h = Conv(self.out_ch, 3, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


class VectorQuantizer(nn.Module):
    """Nearest-codeword quantizer over an [n_embed, embed_dim] codebook
    (ref: taming VectorQuantizer2 with sane_index_shape=True).

    quantize(h) returns (z_q with straight-through gradient, commit loss,
    indices [B, H, W]).
    """
    n_embed: int = 256
    embed_dim: int = 4
    beta: float = 0.25

    def setup(self):
        # torch parity: U(-1/n, 1/n) (ref: taming quantize.py VectorQuantizer2
        # embedding.weight.data.uniform_). flax's uniform() is [0, scale), so
        # shift a [0, 2/n) draw down by 1/n.
        n = self.n_embed
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / n, maxval=1.0 / n),
            (self.n_embed, self.embed_dim),
        )

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices [B, H, W] -> latents [B, H, W, embed_dim]."""
        return jnp.take(self.embedding, indices, axis=0)

    def __call__(self, z: jnp.ndarray):
        B, H, W, D = z.shape
        flat = z.reshape(-1, D)
        # argmin is piecewise-constant: block autodiff through the search
        idx = vq_argmin(jax.lax.stop_gradient(flat),
                        jax.lax.stop_gradient(self.embedding))
        z_q = jnp.take(self.embedding, idx, axis=0).reshape(B, H, W, D)
        # legacy=True loss weighting (ref: quantize.py:294-297)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
            self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss, idx.reshape(B, H, W)


class VQModel(nn.Module):
    """VQModelInterface equivalent: encode returns the PRE-quantization latent
    h (ref: ldm/models/autoencoder.py:264-282); quantization is explicit."""
    n_embed: int = 256
    embed_dim: int = 4
    ddconfig: Optional[Dict[str, Any]] = None
    with_decoder: bool = True
    dtype: Optional[Dtype] = None

    def setup(self):
        dd = dict(self.ddconfig or {})
        common = dict(
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 2, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", (32,))),
            resolution=dd.get("resolution", 256),
            z_channels=dd.get("z_channels", 4),
            dtype=self.dtype,
        )
        self.encoder = VQEncoder(double_z=dd.get("double_z", False), **common)
        if self.with_decoder:
            self.decoder = VQDecoder(out_ch=dd.get("out_ch", 3), **common)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = nn.Dense(self.embed_dim, dtype=self.dtype)       # 1x1 conv
        self.post_quant_conv = nn.Dense(dd.get("z_channels", 4), dtype=self.dtype)

    def encode(self, x):
        """image [-1,1] NHWC -> pre-quant latent h [B, H/8, W/8, embed_dim]."""
        h = self.encoder(x)
        return self.quant_conv(h)

    def encode_quantize(self, x):
        h = self.encode(x)
        z_q, _, idx = self.quantize(h)
        return z_q, idx

    def decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        h = self.post_quant_conv(h)
        return self.decoder(h)

    def __call__(self, x):
        """Full autoencode round trip (used for init/shape checks)."""
        h = self.encode(x)
        z_q, loss, idx = self.quantize(h)
        rec = self.decoder(self.post_quant_conv(z_q))
        return rec, loss, idx
