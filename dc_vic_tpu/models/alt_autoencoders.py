"""Registered alternative analysis/synthesis transforms (non-default configs):
Balle18 (GDN), Cheng20 (residual + GDN + NLAM), and tiny Test stubs
(ref: src/models/subnet/autoencoder/{balle18,cheng20,base}_autoencoder.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    ChengNLAM,
    Conv,
    DeconvTorch,
    GDN,
    PixelShuffleUp,
)
from ..utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY

Dtype = Any


@ENCODER_REGISTRY.register()
class Balle18Encoder(nn.Module):
    out_ch: int = 192
    main_ch: int = 192
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        for _ in range(3):
            x = Conv(self.main_ch, 5, 2, dtype=d)(x)
            x = GDN(dtype=d)(x)
        return Conv(self.out_ch, 5, 2, dtype=d)(x)


@DECODER_REGISTRY.register()
class Balle18Decoder(nn.Module):
    out_ch: int = 3
    main_ch: int = 192
    use_tanh: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        for _ in range(3):
            x = DeconvTorch(self.main_ch, 5, dtype=d)(x)
            x = GDN(inverse=True, dtype=d)(x)
        x = DeconvTorch(self.out_ch, 5, dtype=d)(x)
        return jnp.tanh(x) if self.use_tanh else x


class ChengResBlock(nn.Module):
    """lrelu / (i)gdn residual block with optional downscale
    (ref: src/models/layer/cheng_resblock.py ResBlock)."""
    out_ch: int
    actv2: str = "lrelu"        # 'lrelu' | 'gdn' | 'igdn'
    downscale: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        stride = 2 if self.downscale else 1
        in_ch = x.shape[-1]
        h = Conv(self.out_ch, 3, stride, dtype=d)(x)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.out_ch, 3, dtype=d)(h)
        if self.actv2 == "lrelu":
            h = nn.leaky_relu(h, 0.2)
        elif self.actv2 == "gdn":
            h = GDN(dtype=d)(h)
        elif self.actv2 == "igdn":
            h = GDN(inverse=True, dtype=d)(h)
        if self.downscale or in_ch != self.out_ch:
            x = Conv(self.out_ch, 1, stride, dtype=d)(x)
        return x + h


class ChengUpResBlock(nn.Module):
    """PixelShuffle upsampling residual block (ref: cheng_resblock.py
    UpResBlock, up_type='pixelshuffle')."""
    out_ch: int
    actv2: str = "igdn"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        h = PixelShuffleUp(self.out_ch, kernel=3, dtype=d)(x)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.out_ch, 3, dtype=d)(h)
        if self.actv2 == "igdn":
            h = GDN(inverse=True, dtype=d)(h)
        elif self.actv2 == "lrelu":
            h = nn.leaky_relu(h, 0.2)
        shortcut = PixelShuffleUp(self.out_ch, kernel=1, dtype=d)(x)
        return h + shortcut


@ENCODER_REGISTRY.register()
class Cheng20Encoder(nn.Module):
    out_ch: int = 192
    main_ch: int = 192
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        m = self.main_ch
        x = ChengResBlock(m, "gdn", downscale=True, dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = ChengResBlock(m, "gdn", downscale=True, dtype=d)(x)
        x = ChengNLAM(m, dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = ChengResBlock(m, "gdn", downscale=True, dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = Conv(self.out_ch, 3, 2, dtype=d)(x)
        x = ChengNLAM(self.out_ch, dtype=d)(x)
        return x


@DECODER_REGISTRY.register()
class Cheng20Decoder(nn.Module):
    out_ch: int = 3
    main_ch: int = 192
    use_tanh: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        m = self.main_ch
        x = ChengNLAM(x.shape[-1], dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = ChengUpResBlock(m, "igdn", dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = ChengUpResBlock(m, "igdn", dtype=d)(x)
        x = ChengNLAM(m, dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = ChengUpResBlock(m, "igdn", dtype=d)(x)
        x = ChengResBlock(m, "lrelu", dtype=d)(x)
        x = PixelShuffleUp(self.out_ch, kernel=3, dtype=d)(x)
        return jnp.tanh(x) if self.use_tanh else x


@ENCODER_REGISTRY.register()
class TestEncoder(nn.Module):
    """Tiny wiring stub (ref: base_autoencoder.py TestEncoder)."""
    out_ch: int = 192
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.relu(Conv(32, 5, 2, dtype=self.dtype)(x))
        return Conv(self.out_ch, 5, 2, dtype=self.dtype)(x)


@DECODER_REGISTRY.register()
class TestDecoder(nn.Module):
    out_ch: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.relu(DeconvTorch(32, 5, dtype=self.dtype)(x))
        return DeconvTorch(self.out_ch, 5, dtype=self.dtype)(x)
