"""Feature backbones for perceptual metrics (AlexNet, VGG16) in flax.

The reference consumes these through the lpips / DISTS pip packages (ref:
src/losses/perceptual_loss.py:3, scripts/calc_metrics.py). Pretrained weights
are not distributable with this repo; `convert_alexnet` / `convert_vgg16`
map torchvision-layout state dicts (as shipped inside the lpips package)
onto these modules. Until weights are supplied the metrics report
unavailable rather than wrong numbers.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# lpips package input normalization (images in [-1, 1])
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return (x - _LPIPS_SHIFT) / _LPIPS_SCALE


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features, returning the 5 relu taps LPIPS uses."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)],
                    name="conv0")(x)
        x = nn.relu(x); taps.append(x)
        x = _max_pool(x)
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="conv1")(x)
        x = nn.relu(x); taps.append(x)
        x = _max_pool(x)
        x = nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv3")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv4")(x)
        x = nn.relu(x); taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16.features, returning the 5 relu taps LPIPS/DISTS use
    (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""

    CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        idx = 0
        for stage, (ch, reps) in enumerate(self.CFG):
            for r in range(reps):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage < 4:
                x = _max_pool(x, window=2, stride=2)
        return taps


class LPIPS(nn.Module):
    """Learned perceptual metric: unit-normalized feature diffs, 1x1 linear
    calibration heads, spatial mean, stage sum. net in {'alex', 'vgg'}."""
    net: str = "alex"

    @nn.compact
    def __call__(self, a, b) -> jnp.ndarray:
        """a, b: NHWC in [-1, 1]. Returns per-image LPIPS [B]."""
        backbone = (AlexNetFeatures(name="backbone") if self.net == "alex"
                    else VGG16Features(name="backbone"))
        fa = backbone(lpips_normalize(a))
        fb = backbone(lpips_normalize(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1),
                                     axis=(1, 2))
        return total


class DISTS(nn.Module):
    """Deep Image Structure and Texture Similarity (Ding et al. 2020):
    VGG16 multi-stage features; per-channel learned alpha (texture/mean) and
    beta (structure/correlation) weights."""

    @nn.compact
    def __call__(self, a, b) -> jnp.ndarray:
        """a, b: NHWC in [0, 1]. Returns per-image DISTS distance [B]."""
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        backbone = VGG16Features(name="backbone")
        fa = [a] + backbone((a - mean) / std)
        fb = [b] + backbone((b - mean) / std)
        c1 = c2 = 1e-6
        chans = [f.shape[-1] for f in fa]
        alpha = self.param("alpha", nn.initializers.ones, (sum(chans),))
        beta = self.param("beta", nn.initializers.ones, (sum(chans),))
        w_sum = jnp.sum(alpha) + jnp.sum(beta)
        sim = 0.0
        off = 0
        for xa, xb in zip(fa, fb):
            C = xa.shape[-1]
            a_w = alpha[off:off + C] / w_sum
            b_w = beta[off:off + C] / w_sum
            off += C
            mu_a = jnp.mean(xa, axis=(1, 2))
            mu_b = jnp.mean(xb, axis=(1, 2))
            var_a = jnp.var(xa, axis=(1, 2))
            var_b = jnp.var(xb, axis=(1, 2))
            cov = jnp.mean(xa * xb, axis=(1, 2)) - mu_a * mu_b
            s1 = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
            s2 = (2 * cov + c2) / (var_a + var_b + c2)
            sim = sim + jnp.sum(a_w * s1 + b_w * s2, axis=-1)
        return 1.0 - sim


# --------------------------------------------------------------------------
# torch weight converters
# --------------------------------------------------------------------------

def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_alexnet_lpips(lpips_sd: Dict[str, np.ndarray]) -> Dict:
    """lpips package state dict (net.slice*/ lin*.model.1.weight) -> LPIPS
    params for net='alex'."""
    # torchvision alexnet.features conv indices: 0, 3, 6, 8, 10
    conv_src = [0, 3, 6, 8, 10]
    backbone = {}
    for i, s in enumerate(conv_src):
        w = _find(lpips_sd, [f"net.features.{s}.weight", f"features.{s}.weight"])
        b = _find(lpips_sd, [f"net.features.{s}.bias", f"features.{s}.bias"])
        backbone[f"conv{i}"] = {"kernel": _t_conv(w), "bias": np.asarray(b)}
    params = {"backbone": backbone}
    for i in range(5):
        w = _find(lpips_sd, [f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"])
        params[f"lin{i}"] = np.asarray(w).reshape(-1)
    return {"params": params}


def convert_vgg16_features(sd: Dict[str, np.ndarray], prefix: str = "features"
                           ) -> Dict:
    """torchvision VGG16 features -> VGG16Features params."""
    conv_src = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, s in enumerate(conv_src):
        out[f"conv{i}"] = {
            "kernel": _t_conv(sd[f"{prefix}.{s}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{s}.bias"]),
        }
    return out


def _find(sd, keys):
    for k in keys:
        if k in sd:
            return sd[k]
    raise KeyError(f"none of {keys} in state dict")


def load_lpips(weights_path: Optional[str], net: str = "alex"):
    """Returns a jitted (a, b) -> [B] LPIPS callable, or None when no weights
    are available (callers then skip/flag the metric)."""
    if not weights_path:
        return None
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    model = LPIPS(net=net)
    if net == "alex":
        params = convert_alexnet_lpips(sd)
    else:
        params = {"params": {"backbone": convert_vgg16_features(sd, "net.features")}}
        for i in range(5):
            params["params"][f"lin{i}"] = np.asarray(
                _find(sd, [f"lin{i}.model.1.weight"])).reshape(-1)
    return jax.jit(lambda a, b: model.apply(params, a, b))
