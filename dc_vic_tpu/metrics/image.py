"""Image quality metrics: PSNR, SSIM, MS-SSIM (pure JAX/numpy).

PSNR follows the reference protocol: uint8-rounded pixels, data_range 255
(ref: src/utils/img_utils.py:105-133). MS-SSIM replaces the pytorch_msssim
dependency (ref: src/utils/img_utils.py:137-162).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def tensor_to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 (reference rounding, img_utils.py)."""
    x = (np.clip(img, -1.0, 1.0) + 1.0) / 2.0 * 255.0
    return np.round(x).astype(np.uint8)


def calc_psnr(real: np.ndarray, fake: np.ndarray, data_range: float = 255.0
              ) -> float:
    """Inputs in [-1,1]; computed on uint8-rounded values like the reference."""
    a = tensor_to_uint8(real).astype(np.float64)
    b = tensor_to_uint8(fake).astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _fspecial_gauss_1d(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _gaussian_blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian filter on NHWC."""
    C = x.shape[-1]
    k = win.shape[0]
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kern_w, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=C)


def _ssim_components(x, y, win, data_range: float = 1.0):
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu_x = _gaussian_blur(x, win)
    mu_y = _gaussian_blur(y, win)
    sxx = _gaussian_blur(x * x, win) - mu_x ** 2
    syy = _gaussian_blur(y * y, win) - mu_y ** 2
    sxy = _gaussian_blur(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + C2) / (sxx + syy + C2)
    ssim = ((2 * mu_x * mu_y + C1) / (mu_x ** 2 + mu_y ** 2 + C1)) * cs
    return jnp.mean(ssim, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(x: jnp.ndarray, y: jnp.ndarray, win_size: int = 11,
         win_sigma: float = 1.5) -> jnp.ndarray:
    """Single-scale SSIM per batch element; inputs in [0, 1]."""
    win = _fspecial_gauss_1d(win_size, win_sigma).astype(x.dtype)
    s, _ = _ssim_components(x, y, win)
    return s


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.partial(jax.jit, static_argnames=("win_size",))
def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, win_size: int = 11,
            win_sigma: float = 1.5) -> jnp.ndarray:
    """Multi-scale SSIM per batch element; inputs NHWC in [0, 1].
    Requires min(H, W) > (win_size-1) * 2^4."""
    win = _fspecial_gauss_1d(win_size, win_sigma).astype(x.dtype)
    weights = jnp.asarray(_MSSSIM_WEIGHTS, x.dtype)
    vals = []
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = _ssim_components(x, y, win)
        vals.append(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs)
        if i < len(_MSSSIM_WEIGHTS) - 1:
            # pytorch_msssim convention: odd dims are zero-padded on BOTH
            # sides before the 2x2 average pool, zeros included in the mean
            pad = ((0, 0), (x.shape[1] % 2,) * 2, (x.shape[2] % 2,) * 2,
                   (0, 0))
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), pad) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), pad) / 4.0
    vals = jnp.stack(vals, axis=0)  # [levels, B]
    # pytorch_msssim applies relu to the per-scale cs/ssim means; the tiny
    # floor additionally keeps log() finite
    vals = jnp.clip(vals, 1e-12, None)
    return jnp.exp(jnp.sum(weights[:, None] * jnp.log(vals), axis=0))


def calc_ms_ssim(real: np.ndarray, fake: np.ndarray) -> float:
    """Inputs in [-1,1] NHWC (reference wrapper semantics: -1 on failure,
    ref: img_utils.py:155-160). Images smaller than the 5-scale window
    support ((11-1)*2^4 = 160px) are unscorable."""
    if min(real.shape[1], real.shape[2]) <= 160:
        return -1.0
    try:
        a = (jnp.asarray(real) + 1.0) / 2.0
        b = (jnp.asarray(fake) + 1.0) / 2.0
        v = float(jnp.mean(ms_ssim(a, b)))
        return v if np.isfinite(v) else -1.0
    except Exception:
        return -1.0
