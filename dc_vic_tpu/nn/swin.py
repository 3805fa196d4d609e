"""Swin transformer blocks (RSTB) for the VQ estimator.

Re-designed from the SwinIR layer semantics the reference vendors
(ref: src/models/layer/swinir_layers.py): windowed MSA with relative position
bias, alternating shifted windows, MLP(ratio=4, GELU), LayerNorm, and the RSTB
residual conv. Operates on NHWC feature maps directly (no token (un)embedding
round-trips); all shapes static under jit.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv

Dtype = Any


def _relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] index into the (2ws-1)^2 relative position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)  # [2, ws*ws]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Additive attention mask [num_windows, ws*ws, ws*ws] for shifted windows."""
    img = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xw, mask=None):
        # xw: [B*nW, ws*ws, C]
        Bn, N, C = xw.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(Bn, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [Bn, h, N, hd]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)

        rpb_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window_size)
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, h, N, N)

        attn = jax.nn.softmax(attn, axis=-1).astype(xw.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] with H, W multiples of window_size
        B, H, W, C = x.shape
        ws = self.window_size
        shift = self.shift_size if min(H, W) > ws else 0

        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))

        yw = y.reshape(B, H // ws, ws, W // ws, ws, C)
        yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(H, W, ws, shift))
        yw = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype)(yw, mask)

        y = yw.reshape(B, H // ws, W // ws, ws, ws, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        x = shortcut + y

        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype)(y)
        return x + y


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth Swin blocks (alternating shift)
    followed by a 3x3 conv, wrapped in a residual connection."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
            )(y)
        y = Conv(self.dim, 3, dtype=self.dtype)(y)
        return x + y
