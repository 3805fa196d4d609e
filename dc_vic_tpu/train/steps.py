"""Jitted training steps for the four-stage curriculum (ref: src/trainer/).

Stage map (ref: docs/training.md):
  stage1_1  rate-distortion + VQ-code losses            -> make_rd_step
  stage1_2  + per-sample dual-beta weighted losses      -> make_rd_step(use_beta)
  stage1_3 / stage3  GAN fine-tune of decoder/estimator/fusion
            with frozen entropy path                    -> make_gan_step

Each step performs the main (g) update, the aux (quantile) update, and the
reference's NaN/Inf/huge-loss skip (ref: base_trainer.py:236-245) in one
compiled graph. Multi-chip: wrap the returned step with
parallel.data_parallel_step to get a pjit'd dp version.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.dc_vic import DCVICModel
from .optim import aux_mask, main_mask, zero_frozen_grads


class TrainState(struct.PyTreeNode):
    params: Any
    g_opt: Any
    aux_opt: Any
    step: jnp.ndarray
    rng: jax.Array
    d_params: Any = None
    d_opt: Any = None


@dataclasses.dataclass(frozen=True)
class BetaPolicy:
    """How betas are sampled and how they weight losses
    (ref: dual_cond_rate_distortion_vq_code_trainer.py:71-78)."""
    use_beta: bool = True
    use_selected_pairs: bool = False
    selected_beta_rate: Tuple[float, ...] = ()
    selected_beta_vq: Tuple[float, ...] = ()
    max_beta_rate: float = 3.0
    max_beta_vq: float = 3.5
    num_levels: int = 100
    sample_batch_beta: bool = False
    weight_type: str = "exp"     # 'exp' -> e^beta, 'linear' -> beta + offset
    weight_offset: float = 1.0

    def sample(self, rng: jax.Array, batch_size: int):
        if not self.use_beta:
            return None, None
        n = batch_size if self.sample_batch_beta else 1
        r1, r2 = jax.random.split(rng)
        if self.use_selected_pairs:
            table_r = jnp.asarray(self.selected_beta_rate, jnp.float32)
            table_v = jnp.asarray(self.selected_beta_vq, jnp.float32)
            i = jax.random.randint(r1, (n,), 0, len(self.selected_beta_rate))
            return table_r[i], table_v[i]
        i1 = jax.random.randint(r1, (n,), 0, self.num_levels + 1)
        i2 = jax.random.randint(r2, (n,), 0, self.num_levels + 1)
        beta_r = self.max_beta_rate * i1.astype(jnp.float32) / self.num_levels
        beta_v = self.max_beta_vq * i2.astype(jnp.float32) / self.num_levels
        return beta_r, beta_v

    def weight(self, beta):
        if self.weight_type == "exp":
            return jnp.exp(beta)
        return beta + self.weight_offset


def _finite(x) -> jnp.ndarray:
    return jnp.isfinite(x) & (jnp.abs(x) < 10000.0)


def _cond_update(ok, new_state: TrainState, old_state: TrainState) -> TrainState:
    return jax.tree.map(
        lambda a, b: jnp.where(ok, a, b) if hasattr(a, "shape") else a,
        new_state, old_state)


def _apply_sample_weight(loss_val: jnp.ndarray, weight) -> jnp.ndarray:
    """Per-sample weighting (ref: dual_cond trainer apply_loss_weight):
    reduce non-batch dims per sample, multiply by the (broadcastable)
    per-sample weight, then mean. Scalar losses are weighted by the mean
    weight (equivalent when the weight is shared across the batch)."""
    if jnp.ndim(loss_val) == 0:
        return jnp.mean(weight) * loss_val
    per_sample = jnp.mean(loss_val.reshape(loss_val.shape[0], -1), axis=1)
    return jnp.mean(per_sample * weight)


def _g_losses(module: DCVICModel, losses: Dict, out: Dict, batch,
              beta_rate, beta_vq, policy: BetaPolicy,
              include_rate: bool = True, lpips_fn=None) -> Tuple[jnp.ndarray, Dict]:
    """Shared generator-side loss assembly. With dual-beta conditioning the
    rate term is weighted by w(beta_rate) and the VQ-code terms by
    w(beta_vq), per sample when betas are sampled per sample
    (ref: dual_cond_rate_distortion_vq_code_trainer.py calc_g_loss)."""
    terms: Dict[str, jnp.ndarray] = {}

    if include_rate and "rate_loss" in losses:
        if policy.use_beta:
            w = policy.weight(beta_rate)
            terms["rate"] = _apply_sample_weight(
                losses["rate_loss"].loss_weight * out["bpp_per_sample"], w)
        else:
            terms["rate"] = losses["rate_loss"](out["bpp"])

    if "distortion_loss" in losses:
        terms["distortion"] = losses["distortion_loss"](
            batch, out["fake_images"])
    if "perceptual_loss" in losses:
        terms["perceptual"] = losses["perceptual_loss"](
            batch, out["fake_images"], lpips_fn=lpips_fn)

    code_w = policy.weight(beta_vq) if policy.use_beta else None
    if "code_distortion_loss" in losses:
        cd = losses["code_distortion_loss"]
        per_elem = cd.loss_weight * (out["gt_vq_latent"]
                                     - out["out_vq_latent"]) ** 2
        terms["code_distortion"] = (
            _apply_sample_weight(per_elem, code_w) if code_w is not None
            else jnp.mean(per_elem))
    if "code_ce_loss" in losses:
        ce = losses["code_ce_loss"]
        logits, target = out["out_vq_logits"], out["gt_vq_indices"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        logpt = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        nll = -logpt
        gamma = getattr(ce, "gamma", None)
        if gamma is not None:
            nll = ((1.0 - jnp.exp(logpt)) ** gamma) * nll
        per_elem = ce.loss_weight * nll
        terms["code_ce"] = (
            _apply_sample_weight(per_elem, code_w) if code_w is not None
            else jnp.mean(per_elem))

    total = sum(terms.values())
    return total, terms


def make_rd_step(module: DCVICModel, losses: Dict, g_tx, aux_tx,
                 policy: BetaPolicy, lpips_fn=None) -> Callable:
    """Rate-distortion(+VQ-code) step (stages 1_1 / 1_2)."""

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, r_beta, r_model = jax.random.split(state.rng, 3)
        beta_rate, beta_vq = policy.sample(r_beta, batch.shape[0])

        def loss_fn(params):
            out = module.apply(params, batch, beta_rate, beta_vq,
                               is_train=True, rng=r_model)
            total, terms = _g_losses(module, losses, out, batch,
                                     beta_rate, beta_vq, policy,
                                     include_rate=True, lpips_fn=lpips_fn)
            terms["bpp"] = out["bpp"]
            terms["qbpp"] = out["qbpp"]
            terms["vq_accuracy"] = out["vq_accuracy"]
            return total, terms

        def aux_fn(params):
            return module.apply(params, method=module.aux_loss)

        (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        aux_loss, aux_grads = jax.value_and_grad(aux_fn)(state.params)

        gm = main_mask(state.params["params"])
        grads = {"params": zero_frozen_grads(grads["params"], gm)}
        g_updates, g_opt = g_tx.update(grads, state.g_opt, state.params)
        new_params = optax.apply_updates(state.params, g_updates)

        am = aux_mask(state.params["params"])
        aux_grads = {"params": zero_frozen_grads(aux_grads["params"], am)}
        a_updates, aux_opt = aux_tx.update(aux_grads, state.aux_opt, new_params)
        new_params = optax.apply_updates(new_params, a_updates)

        ok = _finite(total)
        new_state = state.replace(params=new_params, g_opt=g_opt,
                                  aux_opt=aux_opt, step=state.step + 1,
                                  rng=rng)
        new_state = _cond_update(ok, new_state,
                                 state.replace(step=state.step + 1, rng=rng))
        terms["total"] = total
        terms["aux"] = aux_loss
        terms["skipped"] = (~ok).astype(jnp.float32)
        return new_state, terms

    return step


def make_gan_step(module: DCVICModel, disc, losses: Dict, g_tx, aux_tx, d_tx,
                  policy: BetaPolicy, oasis: bool = False,
                  mc_sampling: bool = False, y_hat_cond: bool = False,
                  lpips_fn=None) -> Callable:
    """GAN fine-tune step (stages 1_3 / 3): alternating G and D updates in
    one compiled graph; encoder/entropy path frozen via fix_entropy_models
    (ref: dual_cond_gan_distortion_vq_code_trainer.py:126-190).

    mc_sampling: split the batch so D sees held-out reals (second half)
    against fakes from the first half (ref: :91-114). y_hat_cond: the
    discriminator additionally conditions on y_hat (extract_y_hat for the
    held-out reals, ref: :236-280)."""

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, r_beta, r_model = jax.random.split(state.rng, 3)
        gan_loss = losses["gan_loss"]

        if mc_sampling:
            half = batch.shape[0] // 2
            g_batch, d_real_batch = batch[:half], batch[half:half * 2]
        else:
            g_batch = d_real_batch = batch
        beta_rate, beta_vq = policy.sample(r_beta, g_batch.shape[0])

        def d_apply(d_params, img, y_hat=None):
            if y_hat_cond:
                return disc.apply(d_params, img, beta_rate, beta_vq,
                                  y_hat=y_hat)
            return disc.apply(d_params, img, beta_rate, beta_vq)

        # ---------------- G ----------------
        def g_loss_fn(params):
            out = module.apply(params, g_batch, beta_rate, beta_vq,
                               is_train=True, rng=r_model,
                               fix_entropy_models=True)
            total, terms = _g_losses(module, losses, out, g_batch,
                                     beta_rate, beta_vq, policy,
                                     include_rate=False, lpips_fn=lpips_fn)
            d_out = d_apply(state.d_params, out["fake_images"],
                            out["quantized_code"]["y"])
            if oasis:
                adv = gan_loss(d_out, out["gt_vq_indices"],
                               is_disc=False, is_real=True)
            else:
                adv = gan_loss(d_out, is_real=True, is_disc=False)
            terms["adv"] = adv
            total = total + adv
            terms["bpp"] = out["bpp"]
            terms["vq_accuracy"] = out["vq_accuracy"]
            return total, (terms, out)

        (g_total, (terms, out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)

        gm = main_mask(state.params["params"], gan_stage=True)
        g_grads = {"params": zero_frozen_grads(g_grads["params"], gm)}
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.params)
        new_params = optax.apply_updates(state.params, g_updates)

        # ---------------- D ----------------
        fake = jax.lax.stop_gradient(out["fake_images"])
        fake_y_hat = jax.lax.stop_gradient(out["quantized_code"]["y"])
        gt_idx = out["gt_vq_indices"]
        real_y_hat = None
        real_gt_idx = gt_idx
        if y_hat_cond or (mc_sampling and oasis):
            real_out = module.apply(
                new_params, d_real_batch, beta_rate, beta_vq,
                method=module.extract_y_hat) if y_hat_cond else None
            real_y_hat = real_out
        if mc_sampling and oasis:
            # OASIS D loss on held-out reals needs their token maps
            _, real_gt_idx = module.apply(new_params, d_real_batch,
                                          method=module.vq_encode)

        def d_loss_fn(d_params):
            d_real = d_apply(d_params, d_real_batch, real_y_hat)
            d_fake = d_apply(d_params, fake, fake_y_hat)
            if oasis:
                l_real = gan_loss(d_real, real_gt_idx, is_disc=True,
                                  is_real=True)
                l_fake = gan_loss(d_fake, gt_idx, is_disc=True, is_real=False)
            else:
                l_real = gan_loss(d_real, is_real=True, is_disc=True)
                l_fake = gan_loss(d_fake, is_real=False, is_disc=True)
            return 0.5 * (l_real + l_fake)

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        ok = _finite(g_total) & _finite(d_total)
        new_state = state.replace(params=new_params, g_opt=g_opt,
                                  d_params=new_d_params, d_opt=d_opt,
                                  step=state.step + 1, rng=rng)
        new_state = _cond_update(ok, new_state,
                                 state.replace(step=state.step + 1, rng=rng))
        terms["total"] = g_total
        terms["d_loss"] = d_total
        terms["skipped"] = (~ok).astype(jnp.float32)
        return new_state, terms

    return step
