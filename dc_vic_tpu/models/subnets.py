"""Compression subnets: ELIC transforms, hyperprior, ChARM context model,
Swin VQ-estimator (ref: src/models/subnet/).

All modules are flax.linen over NHWC. Dual-beta conditioning threads one
shared cond vector (Fourier + MLP) through per-layer FiLM modules.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..codec.gaussian import GaussianConditional
from ..nn.layers import (
    BetaScaleShift,
    ChengNLAM,
    Conv,
    DualBetaCondMLP,
    GDN,
    GNResBlock,
    ResidualBottleneckBlocks,
    up_conv,
)
from ..nn.swin import RSTB
from ..utils.registry import (
    CONTEXTMODEL_REGISTRY,
    DECODER_REGISTRY,
    ENCODER_REGISTRY,
    HYPERDECODER_REGISTRY,
    HYPERENCODER_REGISTRY,
    VQ_ESTIMATOR_REGISTRY,
)

Dtype = Any


# =============================================================================
# ELIC analysis / synthesis transforms (ref: elic_autoencoder.py)
# =============================================================================

@ENCODER_REGISTRY.register()
class ElicEncoder(nn.Module):
    """4x stride-2 conv5 + residual bottleneck stacks + NLAM at /4 and /16."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        return x


@DECODER_REGISTRY.register()
class ElicDecoder(nn.Module):
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    use_tanh: bool = True
    pixel_shuffle: bool = False
    res_in_res: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ChengNLAM(x.shape[-1], dtype=d, name="attn1")(x)
        x = up_conv(self.main_ch, self.pixel_shuffle, d)(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d)(x)
        x = up_conv(self.main_ch, self.pixel_shuffle, d)(x)
        x = ChengNLAM(self.main_ch, dtype=d)(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d)(x)
        x = up_conv(self.main_ch, self.pixel_shuffle, d)(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d)(x)
        x = up_conv(self.out_ch, self.pixel_shuffle, d)(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x


@ENCODER_REGISTRY.register()
class ElicVqScEncoder(nn.Module):
    """ElicEncoder + 1x1 projection of the VQ feature added at /8
    (ref: elic_insert_encoder.py ElicVqScEncoder)."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    dtype: Optional[Dtype] = None
    input_vq_latent: bool = True

    @nn.compact
    def __call__(self, x, feat):
        d = self.dtype
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        x = x + Conv(self.main_ch, 1, dtype=d, name="projection")(feat)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        return x


@ENCODER_REGISTRY.register()
class ElicVqCatScEncoder(nn.Module):
    """ElicEncoder with concat->3x3-proj residual VQ insertion at /8 or /16
    (stage1_1 encoder; ref: elic_insert_encoder.py ElicVqCatScEncoder)."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    proj_pos: str = "conv3"
    dtype: Optional[Dtype] = None
    input_vq_latent: bool = True

    @nn.compact
    def __call__(self, x, feat):
        d = self.dtype
        assert self.proj_pos in ("conv3", "conv4")

        def project(h):
            proj = Conv(h.shape[-1], 3, dtype=d, name="projection")(
                jnp.concatenate([feat, h], axis=-1))
            return h + proj

        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        if self.proj_pos == "conv3":
            x = project(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        if self.proj_pos == "conv4":
            x = project(x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        return x


@ENCODER_REGISTRY.register()
class ElicVqEmbCatEncoder(nn.Module):
    """ElicVqCatScEncoder + learned embedding of the VQ indices concatenated
    into the projection (ref: elic_insert_encoder.py ElicVqEmbCatEncoder)."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    proj_pos: str = "conv3"
    vq_n_embed: int = 256
    vq_ind_embed_dim: int = 32
    dtype: Optional[Dtype] = None
    input_vq_latent: bool = True

    @nn.compact
    def __call__(self, x, feat, vq_indices):
        d = self.dtype
        emb_table = self.param(
            "vq_ind_emb", nn.initializers.normal(1.0),
            (self.vq_n_embed, self.vq_ind_embed_dim))

        def project(h):
            emb = jnp.take(emb_table, vq_indices, axis=0)
            proj = Conv(h.shape[-1], 3, dtype=d, name="projection")(
                jnp.concatenate([feat, h, emb], axis=-1))
            return h + proj

        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        if self.proj_pos == "conv3":
            x = project(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        if self.proj_pos == "conv4":
            x = project(x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        return x


@ENCODER_REGISTRY.register()
class ElicDualBetaFtVqEmbCatEncoder(nn.Module):
    """Dual-beta FiLM + embedded-index VQ insertion (ref:
    elic_dual_beta_ft_autoencoder.py ElicDualBetaFtVqEmbCatEncoder; the
    reference skips the FiLM immediately after conv3 — kept for parity)."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    proj_pos: str = "conv3"
    vq_n_embed: int = 256
    vq_ind_embed_dim: int = 32
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    cond_ch: int = 128
    L: int = 10
    use_pi: bool = False
    include_x: bool = True
    dtype: Optional[Dtype] = None
    input_vq_latent: bool = True

    @nn.compact
    def __call__(self, x, feat, beta_1, beta_2, vq_indices):
        d = self.dtype
        cond = DualBetaCondMLP(
            self.cond_ch, self.L, self.max_beta_1, self.max_beta_2,
            self.use_pi, self.include_x, dtype=d, name="beta_mlp",
        )(beta_1, beta_2)
        emb_table = self.param(
            "vq_ind_emb", nn.initializers.normal(1.0),
            (self.vq_n_embed, self.vq_ind_embed_dim))

        def ft(i, h):
            return BetaScaleShift(h.shape[-1], dtype=d,
                                  name=f"beta_ft_{i}")(h, cond)

        def project(h):
            emb = jnp.take(emb_table, vq_indices, axis=0)
            proj = Conv(h.shape[-1], 3, dtype=d, name="projection")(
                jnp.concatenate([feat, h, emb], axis=-1))
            return h + proj

        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ft(0, x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = ft(1, x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ft(2, x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ft(3, x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = ft(4, x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        if self.proj_pos == "conv3":
            x = project(x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = ft(6, x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        if self.proj_pos == "conv4":
            x = project(x)
        x = ft(7, x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        x = ft(8, x)
        return x


@ENCODER_REGISTRY.register()
class ElicDualBetaFtVqScEncoder(nn.Module):
    """Shipped encoder: beta-FiLM after each of the 9 ELIC layers + VQ feature
    concat-projection at /8 (ref: elic_dual_beta_ft_autoencoder.py:48-141)."""
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    res_in_res: bool = False
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    cond_ch: int = 128
    L: int = 10
    use_pi: bool = False
    include_x: bool = True
    dtype: Optional[Dtype] = None
    input_vq_latent: bool = True

    @nn.compact
    def __call__(self, x, feat, beta_1, beta_2):
        d = self.dtype
        cond = DualBetaCondMLP(
            self.cond_ch, self.L, self.max_beta_1, self.max_beta_2,
            self.use_pi, self.include_x, dtype=d, name="beta_mlp",
        )(beta_1, beta_2)

        def ft(i, h):
            return BetaScaleShift(h.shape[-1], dtype=d, name=f"beta_ft_{i}")(h, cond)

        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv1")(x)
        x = ft(0, x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block1")(x)
        x = ft(1, x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv2")(x)
        x = ft(2, x)
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block2")(x)
        x = ft(3, x)
        x = ChengNLAM(self.main_ch, dtype=d, name="attn2")(x)
        x = ft(4, x)
        x = Conv(self.main_ch, 5, 2, dtype=d, name="conv3")(x)
        x = ft(5, x)
        proj = Conv(self.main_ch, 3, dtype=d, name="projection")(
            jnp.concatenate([feat, x], axis=-1))
        x = x + proj
        x = ResidualBottleneckBlocks(self.main_ch, self.block_mid_ch,
                                     self.num_blocks, self.res_in_res, d,
                                     name="block3")(x)
        x = ft(6, x)
        x = Conv(self.out_ch, 5, 2, dtype=d, name="conv4")(x)
        x = ft(7, x)
        x = ChengNLAM(self.out_ch, dtype=d, name="attn4")(x)
        x = ft(8, x)
        return x


class _ElicDecoderLayers(nn.Module):
    """Shared ELIC decoder stack with intermediate taps.

    Runs layers [attn1, conv1, block1, conv2, attn2, block2, conv3, block3,
    conv4] and collects (feat_layer output, fusion features). Early-exits
    once all fusion features are collected (ref: elic_feat_decoder.py
    get_feats / elic_dual_beta_ft_autoencoder.py:332-359). When betas are
    given, applies FiLM *before* each layer plus an initial residual FiLM.
    """
    fusion_layer_dict: Dict[str, str]
    feat_layer_name: str = "block1"
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    use_tanh: bool = False
    pixel_shuffle: bool = False
    res_in_res: bool = False
    # beta conditioning (None cond -> plain decoder)
    cond_ch: int = 128
    max_beta_1: Optional[float] = 3.0
    max_beta_2: Optional[float] = 3.5
    L: int = 10
    use_pi: bool = False
    include_x: bool = True
    use_beta: bool = True
    dtype: Optional[Dtype] = None

    LAYER_NAMES = ("attn1", "conv1", "block1", "conv2", "attn2", "block2",
                   "conv3", "block3", "conv4")

    @nn.compact
    def __call__(self, x, beta_1=None, beta_2=None, run_all: bool = False):
        d = self.dtype
        cond = None
        if self.use_beta:
            cond = DualBetaCondMLP(
                self.cond_ch, self.L, self.max_beta_1, self.max_beta_2,
                self.use_pi, self.include_x, dtype=d, name="beta_mlp",
            )(beta_1, beta_2)
            x = BetaScaleShift(x.shape[-1], dtype=d, name="init_fuse")(x, cond) + x

        rb = dict(mid_ch=self.block_mid_ch, num_blocks=self.num_blocks,
                  res_in_res=self.res_in_res, dtype=d)
        layers = {
            "attn1": lambda h: ChengNLAM(h.shape[-1], dtype=d, name="attn1")(h),
            "conv1": lambda h: up_conv(self.main_ch, self.pixel_shuffle, d)(h),
            "block1": lambda h: ResidualBottleneckBlocks(self.main_ch, **rb, name="block1")(h),
            "conv2": lambda h: up_conv(self.main_ch, self.pixel_shuffle, d)(h),
            "attn2": lambda h: ChengNLAM(self.main_ch, dtype=d, name="attn2")(h),
            "block2": lambda h: ResidualBottleneckBlocks(self.main_ch, **rb, name="block2")(h),
            "conv3": lambda h: up_conv(self.main_ch, self.pixel_shuffle, d)(h),
            "block3": lambda h: ResidualBottleneckBlocks(self.main_ch, **rb, name="block3")(h),
            "conv4": lambda h: up_conv(self.out_ch, self.pixel_shuffle, d)(h),
        }

        feat_1 = None
        fusion_feats: Dict[str, jnp.ndarray] = {}
        want = set(self.fusion_layer_dict.keys())
        for i, name in enumerate(self.LAYER_NAMES):
            if self.use_beta:
                x = BetaScaleShift(x.shape[-1], dtype=d,
                                   name=f"beta_ft_{i}")(x, cond)
            x = layers[name](x)
            if name == self.feat_layer_name:
                feat_1 = x
            if name in want:
                fusion_feats[self.fusion_layer_dict[name]] = x
            if not run_all and len(fusion_feats) == len(want) and feat_1 is not None:
                break

        if run_all and self.use_tanh:
            x = jnp.tanh(x)
        if run_all:
            return x, feat_1, fusion_feats
        return feat_1, fusion_feats


@DECODER_REGISTRY.register()
class ElicFeatFusionDecoder(nn.Module):
    """Non-beta fusion decoder (stage1_1; ref: elic_feat_decoder.py)."""
    fusion_layer_dict: Dict[str, str]
    feat_layer_name: str = "block1"
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    use_tanh: bool = False
    pixel_shuffle: bool = False
    res_in_res: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        self.layers = _ElicDecoderLayers(
            fusion_layer_dict=dict(self.fusion_layer_dict),
            feat_layer_name=self.feat_layer_name, out_ch=self.out_ch,
            main_ch=self.main_ch, block_mid_ch=self.block_mid_ch,
            num_blocks=self.num_blocks, use_tanh=self.use_tanh,
            pixel_shuffle=self.pixel_shuffle, res_in_res=self.res_in_res,
            use_beta=False, dtype=self.dtype,
        )

    def get_feats(self, x):
        return self.layers(x)

    def __call__(self, x):
        return self.layers(x)


@DECODER_REGISTRY.register()
class ElicDualBetaFtFeatFusionDecoder(nn.Module):
    """Shipped decoder: beta-FiLM ELIC decoder with fusion taps
    (ref: elic_dual_beta_ft_autoencoder.py:226-359)."""
    fusion_layer_dict: Dict[str, str]
    feat_layer_name: str = "block1"
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 96
    num_blocks: int = 3
    use_tanh: bool = False
    pixel_shuffle: bool = False
    res_in_res: bool = False
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    cond_ch: int = 128
    L: int = 10
    use_pi: bool = False
    include_x: bool = True
    dtype: Optional[Dtype] = None

    def setup(self):
        self.layers = _ElicDecoderLayers(
            fusion_layer_dict=dict(self.fusion_layer_dict),
            feat_layer_name=self.feat_layer_name, out_ch=self.out_ch,
            main_ch=self.main_ch, block_mid_ch=self.block_mid_ch,
            num_blocks=self.num_blocks, use_tanh=self.use_tanh,
            pixel_shuffle=self.pixel_shuffle, res_in_res=self.res_in_res,
            cond_ch=self.cond_ch, max_beta_1=self.max_beta_1,
            max_beta_2=self.max_beta_2, L=self.L, use_pi=self.use_pi,
            include_x=self.include_x, use_beta=True, dtype=self.dtype,
        )

    def get_feats(self, x, beta_1, beta_2):
        """Returns (transformer_feat, fusion_feat_dict)."""
        return self.layers(x, beta_1, beta_2)

    def __call__(self, x, beta_1, beta_2):
        return self.layers(x, beta_1, beta_2)


# =============================================================================
# Hyperprior (ref: hyperprior/minnen20_hyperprior.py)
# =============================================================================

@HYPERENCODER_REGISTRY.register()
class Minnen20HyperEncoder(nn.Module):
    bottleneck_z: int = 192
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y):
        d = self.dtype
        y = nn.relu(Conv(320, 3, dtype=d, name="conv1")(y))
        y = nn.relu(Conv(256, 5, 2, dtype=d, name="conv2")(y))
        return Conv(self.bottleneck_z, 5, 2, dtype=d, name="conv3")(y)


class _HyperDecoderBlock(nn.Module):
    """Entropy-critical: precision defaults to "high" (see SliceTransform
    note; "default" is the opt-in single-pass-bf16 deployment mode)."""
    out_ch: int
    dtype: Optional[Dtype] = None
    precision: Optional[str] = "high"

    @nn.compact
    def __call__(self, z):
        from ..nn.layers import DeconvTorch
        d = self.dtype
        pr = self.precision
        z = nn.relu(DeconvTorch(192, 5, dtype=d, precision=pr,
                                name="conv1")(z))
        z = nn.relu(DeconvTorch(256, 5, dtype=d, precision=pr,
                                name="conv2")(z))
        return Conv(self.out_ch, 3, dtype=d, precision=pr,
                    name="conv3")(z)


@HYPERDECODER_REGISTRY.register()
class Minnen20HyperDecoder(nn.Module):
    """Two deconv towers -> concat(mu, std) [B, h, w, hyper_out_ch]."""
    hyper_out_ch: int = 256
    dtype: Optional[Dtype] = None
    precision: Optional[str] = "high"

    @nn.compact
    def __call__(self, z):
        mu = _HyperDecoderBlock(self.hyper_out_ch // 2, self.dtype,
                                self.precision, name="hd_mu")(z)
        std = _HyperDecoderBlock(self.hyper_out_ch // 2, self.dtype,
                                 self.precision, name="hd_std")(z)
        return jnp.concatenate([mu, std], axis=-1)


@HYPERENCODER_REGISTRY.register()
class Balle18HyperEncoder(nn.Module):
    bottleneck_z: int = 192
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y):
        d = self.dtype
        y = nn.relu(Conv(self.bottleneck_z, 3, dtype=d)(jnp.abs(y)))
        y = nn.relu(Conv(self.bottleneck_z, 5, 2, dtype=d)(y))
        return Conv(self.bottleneck_z, 5, 2, dtype=d)(y)


@HYPERDECODER_REGISTRY.register()
class Balle18HyperDecoder(nn.Module):
    """Entropy-critical: precision defaults to "high" (SliceTransform note)."""
    hyper_out_ch: int = 256
    dtype: Optional[Dtype] = None
    precision: Optional[str] = "high"

    @nn.compact
    def __call__(self, z):
        from ..nn.layers import DeconvTorch
        d, pr = self.dtype, self.precision
        z = nn.relu(DeconvTorch(192, 5, dtype=d, precision=pr)(z))
        z = nn.relu(DeconvTorch(256, 5, dtype=d, precision=pr)(z))
        return Conv(self.hyper_out_ch, 3, dtype=d, precision=pr)(z)


# =============================================================================
# ChARM channel-autoregressive context model
# (ref: context_model/minnen20_charm_context_model.py, ms2020)
# =============================================================================

class SliceTransform(nn.Module):
    """Entropy-critical (mu/sigma/LRP): convs default to precision="high" —
    a faithful f32 decomposition instead of JAX's default single-pass bf16
    multiplies (max rel err ~2^-21 vs ~2^-8). These values gate rANS
    indexes; bf16-mantissa rounding here is both an accuracy loss vs the
    f32 reference and the divergence amplifier behind the round-3 stream
    desync (PERF.md §8b).

    precision="default" (single-pass bf16) is the opt-in TPU deployment
    mode (model config `entropy_precision: default`): under the
    shared-executable codec the encode and decode sides call the SAME
    lowered executable, so the coarser multiplies stay bitwise-consistent
    between the two — streams remain self-consistent and roundtrips
    bit-exact. The cost is accuracy-vs-f32 (a slightly different, equally
    valid codec — both sides must be built with the same setting; the
    compressai/CPU-parity format keeps "high"). The ~10 TFLOP/batch of
    5x5 slice convs then run one MXU pass instead of three."""
    out_ch: int
    mid_ch: Tuple[int, int] = (224, 128)  # reference widths (ms2020)
    dtype: Optional[Dtype] = None
    precision: Optional[str] = "high"

    @nn.compact
    def __call__(self, x):
        d, pr = self.dtype, self.precision
        x = nn.relu(Conv(self.mid_ch[0], 5, dtype=d, precision=pr,
                         name="conv1")(x))
        x = nn.relu(Conv(self.mid_ch[1], 5, dtype=d, precision=pr,
                         name="conv2")(x))
        return Conv(self.out_ch, 3, dtype=d, precision=pr,
                    name="conv3")(x)


@CONTEXTMODEL_REGISTRY.register()
class Minnen20CharmContextModel(nn.Module):
    """y split into num_slices channel slices; per-slice convnets predict
    mu/sigma from the hyper output + up to max_support_slices previously
    decoded slices; an LRP convnet adds 0.5*tanh(.) residual to each slice.

    Methods:
      __call__          — training/eval forward over all slices (one graph)
      compress_forward  — deterministic: returns symbols+indexes-ready params
      slice_params      — decode-side per-slice (mu, sigma) prediction
      slice_reconstruct — decode-side y_hat_slice from decoded symbols
    """
    num_slices: int = 6
    bottleneck_y: int = 192
    hyper_out_ch: int = 256
    max_support_slices: int = 4
    slice_mid_ch: Tuple[int, int] = (224, 128)
    gaussian: GaussianConditional = GaussianConditional()
    dtype: Optional[Dtype] = None
    precision: Optional[str] = "high"  # see SliceTransform

    def setup(self):
        assert self.bottleneck_y % self.num_slices == 0
        self.slice_ch = self.bottleneck_y // self.num_slices
        mid = tuple(self.slice_mid_ch)
        pr = self.precision
        self.mean_transforms = [
            SliceTransform(self.slice_ch, mid, self.dtype, pr,
                           name=f"mean_{i}")
            for i in range(self.num_slices)]
        self.scale_transforms = [
            SliceTransform(self.slice_ch, mid, self.dtype, pr,
                           name=f"scale_{i}")
            for i in range(self.num_slices)]
        self.lrp_transforms = [
            SliceTransform(self.slice_ch, mid, self.dtype, pr,
                           name=f"lrp_{i}")
            for i in range(self.num_slices)]

    def _supports(self, y_hat_slices: List[jnp.ndarray]) -> List[jnp.ndarray]:
        if self.max_support_slices < 0:
            return y_hat_slices
        return y_hat_slices[: self.max_support_slices]

    def _mu_sigma(self, i: int, hyper_mean, hyper_scale, y_hat_slices):
        sup = self._supports(y_hat_slices)
        mean_support = jnp.concatenate([hyper_mean] + sup, axis=-1)
        scale_support = jnp.concatenate([hyper_scale] + sup, axis=-1)
        # Cross-graph determinism: mu/sigma feed symbolization on the encode
        # side and cdf-index prediction on the decode side — the two graphs
        # must produce BITWISE identical values or the rANS stream desyncs.
        # The barriers pin the slice transforms as an isolated subgraph so
        # XLA cannot fuse them with graph-specific surroundings (fusion
        # context differs between the encode and decode executables and has
        # been observed to flip borderline f32 values; see PERF.md §8 for
        # the first instance of this failure class).
        mean_support = jax.lax.optimization_barrier(mean_support)
        scale_support = jax.lax.optimization_barrier(scale_support)
        mu = self.mean_transforms[i](mean_support)
        sigma = self.scale_transforms[i](scale_support)
        mu, sigma = jax.lax.optimization_barrier((mu, sigma))
        return mu, sigma, mean_support

    def _lrp(self, i: int, mean_support, y_hat_slice):
        # Also entropy-critical: LRP shapes y_hat_prev, which feeds the next
        # slice's mu/sigma on both coder sides — pin it the same way.
        lrp = self.lrp_transforms[i](jax.lax.optimization_barrier(
            jnp.concatenate([mean_support, y_hat_slice], axis=-1)))
        return y_hat_slice + 0.5 * jnp.tanh(
            jax.lax.optimization_barrier(lrp))

    def __call__(self, y, hyper_out, is_train: bool,
                 rng: Optional[jax.Array] = None,
                 calc_q_likelihood: bool = True):
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices, liks, q_liks = [], [], []
        for i, y_slice in enumerate(y_slices):
            mu, sigma, mean_support = self._mu_sigma(
                i, hyper_mean, hyper_scale, y_hat_slices)
            params = jnp.concatenate([mu, sigma], axis=-1)
            sub_rng = None
            if is_train and rng is not None:
                sub_rng = jax.random.fold_in(rng, i)
            y_hat_slice, lik = self.gaussian(y_slice, params, is_train, sub_rng)
            liks.append(lik)
            if calc_q_likelihood:
                _, q_lik = self.gaussian(
                    jax.lax.stop_gradient(y_slice),
                    jax.lax.stop_gradient(params), is_train=False)
                q_liks.append(q_lik)
            y_hat_slice = self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_lik = jnp.concatenate(liks, axis=-1)
        if calc_q_likelihood:
            return y_hat, y_lik, jnp.concatenate(q_liks, axis=-1)
        return y_hat, y_lik

    def compress_forward(self, y, hyper_out):
        """Fully-jittable encode pass. Returns (symbols, sigma, y_hat, y_lik):
        symbols/sigma in slice-concatenated channel order, ready for the host
        rANS encoder (indexes derive from sigma via build_indexes)."""
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices, syms, sigmas, liks = [], [], [], []
        for i, y_slice in enumerate(y_slices):
            mu, sigma, mean_support = self._mu_sigma(
                i, hyper_mean, hyper_scale, y_hat_slices)
            # y_hat MUST be derived from the (clipped) coded symbols, not
            # re-rounded from y — otherwise pathological |sym| > SYM_CLIP
            # values silently diverge from what the decoder reconstructs
            sym = self.gaussian.quantize_symbols(y_slice, mu)
            y_hat_slice = self.gaussian.dequantize(sym, mu)
            lik = self.gaussian.likelihood(y_hat_slice, sigma, mu)
            syms.append(sym)
            sigmas.append(sigma)
            liks.append(lik)
            y_hat_slice = self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        return (jnp.concatenate(syms, axis=-1),
                jnp.concatenate(sigmas, axis=-1),
                jnp.concatenate(y_hat_slices, axis=-1),
                jnp.concatenate(liks, axis=-1))

    def slice_params(self, slice_ind: int, hyper_out, y_hat_prev):
        """Decode-side: (mu, sigma) for slice_ind given previously decoded
        slices stacked on the channel axis (empty -> zeros-channel array)."""
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)
        slices = ([] if y_hat_prev.shape[-1] == 0
                  else list(jnp.split(y_hat_prev,
                                      y_hat_prev.shape[-1] // self.slice_ch,
                                      axis=-1)))
        mu, sigma, _ = self._mu_sigma(slice_ind, hyper_mean, hyper_scale, slices)
        return mu, sigma

    def slice_reconstruct(self, slice_ind: int, hyper_out, y_hat_prev,
                          symbols, mu):
        """Decode-side: dequantize + LRP for slice_ind."""
        hyper_mean, _ = jnp.split(hyper_out, 2, axis=-1)
        slices = ([] if y_hat_prev.shape[-1] == 0
                  else list(jnp.split(y_hat_prev,
                                      y_hat_prev.shape[-1] // self.slice_ch,
                                      axis=-1)))
        sup = self._supports(slices)
        mean_support = jnp.concatenate([hyper_mean] + sup, axis=-1)
        y_hat_slice = self.gaussian.dequantize(symbols, mu)
        return self._lrp(slice_ind, mean_support, y_hat_slice)


# =============================================================================
# Swin VQ estimator (ref: vq_estimator/swin_vq_estimator.py)
# =============================================================================

@VQ_ESTIMATOR_REGISTRY.register()
class DualBlockSwinVqEstimator(nn.Module):
    """conv+GNResBlocks head -> embed projection -> N x RSTB -> logits head.

    Returns (pred_embed [B,h,w,embed_dim], logits [B,h,w,n_embed]).
    Window padding (reflect) applied when h or w is not a multiple of the
    window (eval-time; shapes static under jit)."""
    main_ch: int = 128
    n_embed: int = 256
    embed_dim: int = 4
    blk_depth: int = 3
    num_heads: int = 8
    window_size: int = 8
    num_swin_blocks: int = 3
    act_type: str = "silu"
    use_upsample: bool = False
    proj_pos: str = "before_rstb"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = Conv(self.main_ch, 3, dtype=d)(x)
        if self.use_upsample:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = GNResBlock(self.main_ch, act=self.act_type, dtype=d)(x)
        x = GNResBlock(self.main_ch, act=self.act_type, dtype=d)(x)
        x = Conv(self.main_ch, 3, dtype=d)(x)

        pred_embed = None
        if self.proj_pos == "before_rstb":
            pred_embed = Conv(self.embed_dim, 1, dtype=d, name="embed_projection")(x)

        B, H, W, C = x.shape
        ws = self.window_size
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        for _ in range(self.num_swin_blocks):
            x = RSTB(self.main_ch, self.blk_depth, self.num_heads, ws, dtype=d)(x)
        if pad_h or pad_w:
            x = x[:, :H, :W, :]

        if self.proj_pos == "after_rstb":
            pred_embed = Conv(self.embed_dim, 1, dtype=d, name="embed_projection")(x)

        x = GNResBlock(self.main_ch, act=self.act_type, dtype=d)(x)
        logits = Conv(self.n_embed, 3, dtype=d)(x)
        return pred_embed, logits
