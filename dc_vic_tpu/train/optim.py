"""Optimizers, LR schedules, and parameter partitioning.

Mirrors the reference's optimizer surface (ref: src/trainer/optimizer/
build_optimizer_scheduler.py): Adam/SGD; MultiStepLR, LinearWarmupScheduler,
LinearWarmupMultiStepLR; paramwise lr-multiplier groups by key substring.
Parameter partitioning implements the reference's freezing rules:
  * aux optimizer sees only EntropyBottleneck quantiles
    (ref: base_model.py separete_aux_parameters)
  * the frozen VQGAN prior (vq_model + fused_decoder minus fusion_*) never
    trains (ref: rate_distortion_vq_code_trainer.py:62)
  * GAN stages train only decoder / vq_estimator / fusion
    (ref: dual_cond_gan_distortion_vq_code_trainer.py:48-52)
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..utils.registry import OPTIMIZER_REGISTRY, SCHEDULER_REGISTRY


# --------------------------------------------------------------------------
# Schedules
# --------------------------------------------------------------------------

@SCHEDULER_REGISTRY.register("MultiStepLR")
def multi_step_lr(base_lr: float, milestones, gamma: float = 0.1, **kw):
    bounds = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, bounds)


@SCHEDULER_REGISTRY.register("LinearWarmupScheduler")
def linear_warmup(base_lr: float, warmup_iters: int, warmup_factor: float = 0.1,
                  **kw):
    def sched(step):
        frac = jnp.clip(step / max(1, warmup_iters), 0.0, 1.0)
        return base_lr * (warmup_factor + (1.0 - warmup_factor) * frac)
    return sched


@SCHEDULER_REGISTRY.register("LinearWarmupMultiStepLR")
def linear_warmup_multistep(base_lr: float, warmup_iters: int,
                            milestones, gamma: float = 0.1,
                            warmup_factor: float = 0.1, **kw):
    ms = multi_step_lr(base_lr, milestones, gamma)
    wu = linear_warmup(1.0, warmup_iters, warmup_factor)
    return lambda step: ms(step) * wu(step)


def build_schedule(base_lr: float, sched_cfg: Optional[Dict]):
    if not sched_cfg:
        return base_lr
    cfg = dict(sched_cfg)
    stype = cfg.pop("type")
    return SCHEDULER_REGISTRY.get(stype)(base_lr, **cfg)


# --------------------------------------------------------------------------
# Optimizers
# --------------------------------------------------------------------------

def paramwise_scale(rules: Dict[str, float]) -> optax.GradientTransformation:
    """Per-parameter lr multipliers keyed by path substring
    (ref: build_optimizer_scheduler.py:74-100 paramwise_opt)."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        flat = traverse_util.flatten_dict(updates["params"]
                                          if "params" in updates else updates)
        out = {}
        for path, u in flat.items():
            scale = 1.0
            joined = "/".join(path)
            for key, mult in rules.items():
                if key in joined:
                    scale *= mult
            out[path] = u * scale
        out = traverse_util.unflatten_dict(out)
        if "params" in updates:
            out = {"params": out}
        return out, state

    return optax.GradientTransformation(init, update)


def build_optimizer(opt_cfg: Dict, sched_cfg: Optional[Dict] = None,
                    clip_max_norm: Optional[float] = None,
                    mask=None) -> optax.GradientTransformation:
    cfg = dict(opt_cfg)
    otype = cfg.pop("type", "Adam")
    lr = cfg.pop("lr", 1e-4)
    paramwise = cfg.pop("paramwise_opt", None)
    schedule = build_schedule(lr, sched_cfg)

    if otype == "Adam":
        tx = optax.adam(schedule, **cfg)
    elif otype == "AdamW":
        tx = optax.adamw(schedule, **cfg)
    elif otype == "SGD":
        tx = optax.sgd(schedule, momentum=cfg.pop("momentum", 0.0))
    else:
        raise KeyError(f"unknown optimizer {otype}")

    chain = []
    if clip_max_norm:
        chain.append(optax.clip_by_global_norm(clip_max_norm))
    chain.append(tx)
    if paramwise:
        chain.append(paramwise_scale(dict(paramwise)))
    tx = optax.chain(*chain)
    if mask is not None:
        tx = optax.masked(tx, mask)
    return tx


def reset_schedule_counts(opt_state):
    """Zero every schedule step counter inside an optimizer state, keeping
    Adam moments intact. Implements the reference's ``load_scheduler: False``
    cross-experiment knob (ref: rate_distortion_vq_code_trainer.py:267-271 —
    optimizer state is loaded but the LR scheduler restarts from step 0)."""
    def rec(x):
        if isinstance(x, optax.ScaleByScheduleState):
            return x._replace(count=jnp.zeros_like(x.count))
        if isinstance(x, tuple) and hasattr(x, "_fields"):
            return type(x)(*(rec(v) for v in x))
        if isinstance(x, tuple):
            return tuple(rec(v) for v in x)
        if isinstance(x, list):
            return [rec(v) for v in x]
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        return x
    return rec(opt_state)


# --------------------------------------------------------------------------
# Partitioning
# --------------------------------------------------------------------------

def _path_mask(params, pred: Callable[[Tuple[str, ...]], bool]):
    flat = traverse_util.flatten_dict(params)
    mask = {k: bool(pred(k)) for k in flat}
    return traverse_util.unflatten_dict(mask)


def is_aux_path(path: Tuple[str, ...]) -> bool:
    return path[-1] == "quantiles"


def is_frozen_prior_path(path: Tuple[str, ...]) -> bool:
    """The frozen VQGAN prior: vq_model subtree and the fused decoder's
    non-fusion weights."""
    p = path[1:] if path and path[0] == "params" else path
    if not p:
        return False
    if p[0] == "vq_model":
        return True
    if p[0] == "fused_decoder" and not p[1].startswith("fusion_"):
        return True
    return False


GAN_TRAINABLE_ROOTS = ("decoder", "vq_estimator", "fused_decoder")


def is_gan_trainable_path(path: Tuple[str, ...]) -> bool:
    """GAN stages optimize decoder + vq_estimator + fusion modules only."""
    p = path[1:] if path and path[0] == "params" else path
    if not p:
        return False
    if p[0] == "fused_decoder":
        return p[1].startswith("fusion_")
    return p[0] in ("decoder", "vq_estimator")


def main_mask(params, gan_stage: bool = False):
    """Mask for the main (g) optimizer."""
    def pred(path):
        if is_aux_path(path) or is_frozen_prior_path(path):
            return False
        if gan_stage:
            return is_gan_trainable_path(path)
        return True
    return _path_mask(params, pred)


def aux_mask(params):
    return _path_mask(params, is_aux_path)


def zero_frozen_grads(grads, mask):
    """Zero out gradient leaves wherever mask is False (so masked optax
    transforms see clean zeros and global-norm clipping ignores them)."""
    flat_g = traverse_util.flatten_dict(grads)
    flat_m = traverse_util.flatten_dict(mask)
    out = {k: (g if flat_m[k] else jax.numpy.zeros_like(g))
           for k, g in flat_g.items()}
    return traverse_util.unflatten_dict(out)
