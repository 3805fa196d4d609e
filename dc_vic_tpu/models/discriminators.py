"""Discriminators (ref: src/models/discriminator/).

PatchGAN (pix2pix) NLayer discriminator with selectable normalization, plus
the dual-beta-conditioned variants the shipped configs use: Fourier-embedded
betas -> MLP -> a conditioning map concatenated to the image channels
(input_nc = 3 + cond_ch), optional y_hat conditioning branch. The OASIS
config reuses the same trunk with out_nc = n_embed + 1 and keep_shape=True
(ref: config/dc_vic_oasis.yaml:36-50).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import fourier_encode_beta, num_groups32
from ..utils.registry import DISCRIMINATOR_REGISTRY

Dtype = Any


class _Norm(nn.Module):
    norm_type: str = "batchnorm"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        nt = self.norm_type
        if nt == "none":
            return x
        if nt == "batchnorm":
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype)(x)
        if nt == "instancenorm":
            # per-sample, per-channel spatial normalization (no affine)
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if nt == "layernorm":
            return nn.LayerNorm(dtype=self.dtype)(x)
        if nt == "groupnorm":
            return nn.GroupNorm(num_groups=num_groups32(x.shape[-1]),
                                dtype=self.dtype)(x)
        if nt == "actnorm":
            # Flow-style ActNorm (ref: taming/modules/util.py:10-62):
            # trainable per-channel loc/scale, data-dependent initialized so
            # the first batch comes out zero-mean/unit-variance. The torch
            # version captures stats on the first training forward; the flax
            # idiom is to capture them from the `init` input — the trainer
            # inits the discriminator on a real data batch when actnorm is
            # configured. Degenerate constant inputs (e.g. a zeros dummy)
            # fall back to identity instead of a 1e6 scale.
            def scale_init(_rng):
                std = jnp.std(x, axis=tuple(range(x.ndim - 1)), ddof=1)
                return jnp.where(std > 1e-12, 1.0 / (std + 1e-6),
                                 jnp.ones_like(std))

            def loc_init(_rng):
                return -jnp.mean(x, axis=tuple(range(x.ndim - 1)))

            scale = self.param("scale", scale_init)
            loc = self.param("loc", loc_init)
            return scale * (x + loc)
        raise NotImplementedError(nt)


def _conv_kinit(weight_init: bool):
    """DCGAN-style conv kernel init used by the reference discriminators when
    weight_init=True (default): N(0, 0.02) on every conv weight
    (ref: taming/modules/discriminator/model.py:8-14 weights_init)."""
    if weight_init:
        return nn.initializers.normal(stddev=0.02)
    return nn.initializers.lecun_normal()


@DISCRIMINATOR_REGISTRY.register()
class TamingNLayerDiscriminator(nn.Module):
    """PatchGAN: stride-2 4x4 convs doubling filters, then two stride-1
    convs; out_nc-channel patch logits."""
    ndf: int = 64
    out_nc: int = 1
    n_layers: int = 3
    keep_shape: bool = False
    norm_type: str = "batchnorm"
    weight_init: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        ki = _conv_kinit(self.weight_init)
        use_bias = self.norm_type != "batchnorm"
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    kernel_init=ki, dtype=d)(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=use_bias,
                        kernel_init=ki, dtype=d)(h)
            h = _Norm(self.norm_type, dtype=d)(h, train)
            h = nn.leaky_relu(h, 0.2)

        kw = 3 if self.keep_shape else 4
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (kw, kw), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=use_bias,
                    kernel_init=ki, dtype=d)(h)
        h = _Norm(self.norm_type, dtype=d)(h, train)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_nc, (kw, kw), strides=(1, 1),
                       padding=[(1, 1), (1, 1)], kernel_init=ki, dtype=d)(h)


@DISCRIMINATOR_REGISTRY.register()
class DualBetaCondTamingNLayerDiscriminator(nn.Module):
    """PatchGAN conditioned on (beta_rate, beta_vq) via a Fourier+MLP cond
    map broadcast over H, W and concatenated to the input channels."""
    ndf: int = 64
    out_nc: int = 1
    n_layers: int = 3
    keep_shape: bool = False
    norm_type: str = "none"
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    L: int = 10
    cond_ch: int = 8
    use_pi: bool = False
    include_x: bool = True
    y_hat_cond: bool = False
    y_hat_out_ch: Optional[int] = None
    weight_init: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, beta_1, beta_2, y_hat=None, train: bool = True):
        B, H, W, _ = x.shape
        d = self.dtype
        e1 = fourier_encode_beta(beta_1, self.L, self.max_beta_1,
                                 self.use_pi, self.include_x)
        e2 = fourier_encode_beta(beta_2, self.L, self.max_beta_2,
                                 self.use_pi, self.include_x)
        cond = jnp.concatenate([e1, e2], axis=-1)
        cond = nn.Dense(self.cond_ch, dtype=d)(cond)
        cond = nn.relu(cond)
        cond = nn.Dense(self.cond_ch, dtype=d)(cond)
        cond = jnp.broadcast_to(cond[:, None, None, :],
                                (B, H, W, self.cond_ch))
        h = jnp.concatenate([x, cond], axis=-1)

        if self.y_hat_cond:
            assert y_hat is not None
            y = jax.lax.stop_gradient(y_hat)
            y = nn.Conv(self.y_hat_out_ch, (3, 3), padding="SAME",
                        kernel_init=_conv_kinit(self.weight_init), dtype=d)(y)
            y = nn.leaky_relu(y, 0.2)
            rep = H // y.shape[1]
            y = jnp.repeat(jnp.repeat(y, rep, axis=1), W // y_hat.shape[2], axis=2)
            h = jnp.concatenate([h, y], axis=-1)

        return TamingNLayerDiscriminator(
            self.ndf, self.out_nc, self.n_layers, self.keep_shape,
            self.norm_type, weight_init=self.weight_init,
            dtype=d, name="trunk")(h, train)


@DISCRIMINATOR_REGISTRY.register()
class DualBetaFtTamingNLayerDiscriminator(nn.Module):
    """FiLM variant: per-layer beta scale/shift inside the PatchGAN trunk
    instead of input-channel concatenation (ref:
    dual_beta_taming_nlayer_discriminator.py:109-215)."""
    ndf: int = 64
    out_nc: int = 1
    n_layers: int = 3
    norm_type: str = "none"
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    L: int = 10
    cond_ch: int = 64
    use_pi: bool = False
    include_x: bool = True
    weight_init: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, beta_1, beta_2, y_hat=None, train: bool = True):
        from ..nn.layers import BetaScaleShift, DualBetaCondMLP
        d = self.dtype
        ki = _conv_kinit(self.weight_init)
        cond = DualBetaCondMLP(self.cond_ch, self.L, self.max_beta_1,
                               self.max_beta_2, self.use_pi, self.include_x,
                               dtype=d)(beta_1, beta_2)
        use_bias = self.norm_type != "batchnorm"
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], kernel_init=ki, dtype=d)(x)
        h = BetaScaleShift(self.ndf, dtype=d)(h, cond)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=use_bias,
                        kernel_init=ki, dtype=d)(h)
            h = _Norm(self.norm_type, dtype=d)(h, train)
            h = BetaScaleShift(self.ndf * nf, dtype=d)(h, cond)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=use_bias,
                    kernel_init=ki, dtype=d)(h)
        h = _Norm(self.norm_type, dtype=d)(h, train)
        h = BetaScaleShift(self.ndf * nf, dtype=d)(h, cond)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_nc, (4, 4), strides=(1, 1),
                       padding=[(1, 1), (1, 1)], kernel_init=ki, dtype=d)(h)


@DISCRIMINATOR_REGISTRY.register()
class OasisDualBetaCondTamingNLayerDiscriminator(nn.Module):
    """OASIS-style per-pixel (n_embed+1)-class discriminator: the shipped
    OASIS config is the NLayer trunk with keep_shape + a nearest-upsample head
    back to the VQ token grid (ref: oasis_discriminator.py, MS-ILLM)."""
    ndf: int = 64
    n_embed: int = 256
    n_layers: int = 3
    norm_type: str = "none"
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    L: int = 10
    cond_ch: int = 8
    use_pi: bool = False
    include_x: bool = True
    token_stride: int = 8  # logits predicted on the H/8 VQ token grid
    weight_init: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, beta_1, beta_2, y_hat=None, train: bool = True):
        logits = DualBetaCondTamingNLayerDiscriminator(
            ndf=self.ndf, out_nc=self.n_embed + 1, n_layers=self.n_layers,
            keep_shape=True, norm_type=self.norm_type,
            max_beta_1=self.max_beta_1, max_beta_2=self.max_beta_2,
            L=self.L, cond_ch=self.cond_ch, use_pi=self.use_pi,
            include_x=self.include_x, weight_init=self.weight_init,
            dtype=self.dtype, name="body",
        )(x, beta_1, beta_2, y_hat, train)
        # trunk output is at /2^n_layers; resize to the token grid (H/8)
        tgt_h = x.shape[1] // self.token_stride
        tgt_w = x.shape[2] // self.token_stride
        return jax.image.resize(
            logits, (logits.shape[0], tgt_h, tgt_w, logits.shape[-1]),
            method="nearest")


def build_discriminator(opt: Dict, dtype=None):
    """Config -> discriminator module (ref: src/models/discriminator/__init__.py)."""
    cfg = dict(opt)
    dtype_kw = {"dtype": dtype}
    dtype_kw.update(cfg)
    cfg = dtype_kw
    disc_type = cfg.pop("type")
    # torch-only / input-inferred keys
    for k in ("input_nc", "use_actnorm", "norm_kwargs",
              "y_hat_in_ch"):
        cfg.pop(k, None)
    return DISCRIMINATOR_REGISTRY.get(disc_type)(**cfg)
