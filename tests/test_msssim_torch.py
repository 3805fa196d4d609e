"""Numerical cross-check of the JAX MS-SSIM against the pytorch_msssim
conventions the reference evaluates with (ref: src/utils/img_utils.py:137-162,
pytorch_msssim.ms_ssim defaults: 11-tap gaussian sigma 1.5, weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], odd-dim both-side zero padding in
the 2x2 average pool). The torch implementation below is written from those
published conventions and serves as the golden fixture — a constant offset
in either direction would skew eval parity silently (VERDICT round 1 #7)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dc_vic_tpu.metrics.image import ms_ssim, ssim

WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _win(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - (size - 1) / 2.0
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum())


def _blur(x, win):
    # separable valid-mode gaussian, NCHW
    C = x.shape[1]
    k = win.shape[0]
    x = F.conv2d(x, win.view(1, 1, k, 1).repeat(C, 1, 1, 1), groups=C)
    return F.conv2d(x, win.view(1, 1, 1, k).repeat(C, 1, 1, 1), groups=C)


def _ssim_torch(x, y, win, data_range=1.0):
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    mu_x, mu_y = _blur(x, win), _blur(y, win)
    sxx = _blur(x * x, win) - mu_x ** 2
    syy = _blur(y * y, win) - mu_y ** 2
    sxy = _blur(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + C2) / (sxx + syy + C2)
    ss = (2 * mu_x * mu_y + C1) / (mu_x ** 2 + mu_y ** 2 + C1) * cs
    return ss.mean(dim=(1, 2, 3)), cs.mean(dim=(1, 2, 3))


def _ms_ssim_torch(x, y):
    win = _win()
    vals = []
    for i in range(5):
        s, cs = _ssim_torch(x, y, win)
        vals.append(torch.relu(s if i == 4 else cs))
        if i < 4:
            pad = [x.shape[-2] % 2, x.shape[-1] % 2]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    vals = torch.stack(vals)  # [5, B]
    w = torch.tensor(WEIGHTS, dtype=vals.dtype).view(5, 1)
    return torch.prod(vals ** w, dim=0)


def _pair(shape, seed, noise):
    rng = np.random.default_rng(seed)
    # natural-ish: smooth gradients + structure + noise
    H, W = shape[1], shape[2]
    yy, xx = np.meshgrid(np.linspace(0, 3, H), np.linspace(0, 3, W),
                         indexing="ij")
    base = 0.5 + 0.3 * np.sin(yy * 2)[..., None] * np.cos(xx * 1.7)[..., None]
    base = np.broadcast_to(base, (shape[0], H, W, shape[3])).copy()
    base += rng.uniform(0, 0.2, base.shape)
    a = np.clip(base, 0, 1).astype(np.float64)
    b = np.clip(a + rng.normal(0, noise, a.shape), 0, 1)
    return a, b


@pytest.mark.parametrize("shape,noise", [
    ((1, 192, 256, 3), 0.05),
    ((2, 176, 176, 1), 0.15),
    ((1, 181, 211, 3), 0.08),   # odd dims exercise the pad convention
])
def test_ms_ssim_matches_torch_fixture(shape, noise):
    a, b = _pair(shape, 0, noise)
    ours = np.asarray(ms_ssim(jnp.asarray(a, jnp.float32),
                              jnp.asarray(b, jnp.float32)))
    theirs = _ms_ssim_torch(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=0)


def test_ssim_matches_torch_fixture():
    a, b = _pair((2, 96, 128, 3), 1, 0.1)
    ours = np.asarray(ssim(jnp.asarray(a, jnp.float32),
                           jnp.asarray(b, jnp.float32)))
    theirs = _ssim_torch(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                         torch.from_numpy(b.transpose(0, 3, 1, 2)),
                         _win())[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=0)


def test_identical_images_score_one():
    a, _ = _pair((1, 256, 256, 3), 2, 0.0)
    v = float(np.asarray(ms_ssim(jnp.asarray(a, jnp.float32),
                                 jnp.asarray(a, jnp.float32)))[0])
    assert abs(v - 1.0) < 1e-6
