"""Trainers (ref: src/trainer/).

One Trainer class drives the four-stage curriculum; the stage semantics live
in the step factories (steps.py):
  RateDistortionVqCodeTrainer            stage1_1 (ref: rate_distortion_vq_code_trainer.py)
  DualBetaCondRateDistortionVqCodeTrainer stage1_2 (ref: dual_cond_rate_distortion...py)
  DualBetaCondGanDistortionVqCodeTrainer  stage1_3/3 (ref: dual_cond_gan_distortion...py)
  DualBetaCondOasisGanDistortionVqFusionTrainer (ref: dual_cond_oasis_gan...py)

The train loop keeps the reference cadence: log every log_step, validate every
eval_step, save every save_step, NaN-skip in-step (compiled into the graph).
Data-parallel across chips via parallel.data_parallel_step.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..data import HostDataLoader, build_dataset
from ..metrics.image import calc_ms_ssim, calc_psnr
from ..models import build_comp_model
from ..models.dc_vic import pad_image
from ..models.discriminators import build_discriminator
from ..parallel import data_parallel_step, make_mesh, replicate, shard_batch
from ..utils import (
    AvgMeter,
    CSVLogger,
    PathHandler,
    Timer,
    bolded_log,
    get_root_logger,
)
from ..utils.registry import TRAINER_REGISTRY
from .losses import build_loss
from .optim import build_optimizer, reset_schedule_counts
from .saver import Saver
from .steps import BetaPolicy, TrainState, make_gan_step, make_rd_step


class Trainer:
    """Generic stage trainer; `gan` / `oasis` select the step graph."""

    def __init__(self, opt, gan: bool = False, oasis: bool = False):
        self.opt = opt
        self.gan = gan
        self.oasis = oasis
        self.logger = get_root_logger()
        self.paths = PathHandler(opt.get("ckpt_root", "./checkpoint"),
                                 opt.get("exp", "exp"))
        self.paths.make_job_dir()

        self.spec = build_comp_model(opt)
        self.module = self.spec.module

        self.losses = {k: build_loss(v) for k, v in
                       dict(opt.get("loss") or {}).items()
                       if isinstance(v, dict) and v.get("type")}
        self._set_data()
        self._set_state_and_step()
        self._set_loggers()

    # ------------------------------------------------------------------
    def _set_data(self):
        dcfg = self.opt["dataset"]
        self.batch_size = dcfg.get("batch_size", 6)
        self.train_loader = HostDataLoader(
            build_dataset(dcfg["train_dataset"], is_train=True),
            self.batch_size, num_workers=8,
            seed=self.opt.get("seed", 0))
        self.eval_loader = HostDataLoader(
            build_dataset(dcfg["eval_dataset"], is_train=False), 1,
            num_workers=1)

    def _init_params(self, rng):
        size = self.opt["dataset"]["train_dataset"].get("image_size", 256)
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        beta = jnp.array([0.0]) if self.module.use_beta else None
        if self.module.use_beta:
            return jax.jit(lambda r: self.module.init(
                {"params": r}, x, beta, beta, is_train=False))(rng)
        return jax.jit(lambda r: self.module.init(
            {"params": r}, x, is_train=False))(rng)

    def _set_lpips(self):
        """Build the calibrated LPIPS callable when perceptual loss is
        configured (ref: src/losses/perceptual_loss.py:1-30 — lpips.LPIPS
        net='alex'). Weights come from `loss.perceptual_loss.weights_path`
        or top-level `lpips_weights`; without them the loss degrades to the
        gradient-L1 proxy, loudly flagged here."""
        self.lpips_fn = None
        if "perceptual_loss" not in self.losses:
            return
        pl_cfg = dict((self.opt.get("loss") or {}).get("perceptual_loss") or {})
        wpath = pl_cfg.get("weights_path") or self.opt.get("lpips_weights")
        from ..metrics.feature_nets import load_lpips
        self.lpips_fn = load_lpips(wpath, net=pl_cfg.get("net", "alex"))
        calibrated = self.lpips_fn is not None
        lvl = self.logger.info if calibrated else self.logger.warning
        lvl(f"perceptual_loss calibrated={calibrated}"
            + ("" if calibrated else
               " — LPIPS weights missing, using gradient-L1 proxy"))

    def _set_state_and_step(self):
        opt = self.opt
        optim = opt.get("optim") or {}
        rng = jax.random.PRNGKey(opt.get("seed", 0))
        rng, init_rng, d_rng = jax.random.split(rng, 3)
        params = self._init_params(init_rng)
        self._set_lpips()

        # new_g_lr / new_d_lr cross-exp LR overrides take effect when the old
        # optimizer state is carried over (ref: dual_cond_gan trainer :385-391
        # — update_learning_rate after load_state_dict).
        load_cfg = dict(opt.get("load_checkpoint") or {})
        g_opt_cfg = dict(optim.get("g_optimizer", {"lr": 1e-4}))
        d_opt_cfg = dict(optim.get("d_optimizer", optim.get("g_optimizer", {})))
        if load_cfg.get("load_optimizer", True):
            if load_cfg.get("new_g_lr") is not None:
                g_opt_cfg["lr"] = float(load_cfg["new_g_lr"])
            if load_cfg.get("new_d_lr") is not None:
                d_opt_cfg["lr"] = float(load_cfg["new_d_lr"])

        clip = optim.get("clip_max_norm")
        self.g_tx = build_optimizer(g_opt_cfg, optim.get("g_scheduler"), clip)
        self.aux_tx = build_optimizer(optim.get("aux_optimizer", {"lr": 1e-3}),
                                      None, None)

        model_cfg = dict(opt.get("model") or {})
        trainer_cfg = dict(opt.get("trainer") or {})
        enc_cfg = dict(opt["subnet"]["encoder"])
        policy = BetaPolicy(
            use_beta=self.module.use_beta,
            use_selected_pairs=model_cfg.get("use_selected_beta_pairs", False),
            selected_beta_rate=tuple(model_cfg.get("selected_beta_rate") or ()),
            selected_beta_vq=tuple(model_cfg.get("selected_beta_vq") or ()),
            max_beta_rate=enc_cfg.get("max_beta_1") or 3.0,
            max_beta_vq=enc_cfg.get("max_beta_2") or 3.5,
            num_levels=model_cfg.get("num_beta_levels", 100),
            sample_batch_beta=(trainer_cfg.get("sample_beta_batch")
                               or model_cfg.get("sample_batch_beta", False)),
            # reference default is 'linear' with offset 1.0 (shipped configs
            # set beta_policy: exp) — dual_cond_rate_..._trainer.py:61-62
            weight_type=(trainer_cfg.get("beta_policy")
                         or model_cfg.get("beta_weight_type", "linear")),
            weight_offset=trainer_cfg.get("beta_offset", 1.0),
        )
        self.policy = policy

        d_params = d_opt = None
        if self.gan:
            self.disc = build_discriminator(dict(opt["discriminator"]))
            size = self.opt["dataset"]["train_dataset"].get("image_size", 256)
            if opt["discriminator"].get("norm_type") == "actnorm":
                # ActNorm's loc/scale are data-dependent initialized from the
                # first batch's per-channel stats (ref: taming ActNorm
                # initializes on its first training forward) — init on real
                # data instead of a zeros dummy.
                dummy = jnp.asarray(next(self.train_loader.infinite())
                                    ["real_images"])
            else:
                dummy = jnp.zeros((1, size, size, 3), jnp.float32)
            beta = jnp.array([0.0])
            d_params = jax.jit(lambda r, d: self.disc.init(
                r, d, beta, beta))(d_rng, dummy)
            self.d_tx = build_optimizer(d_opt_cfg,
                                        optim.get("d_scheduler"), clip)
            d_opt = self.d_tx.init(d_params)

        self.state = TrainState(
            params=params,
            g_opt=self.g_tx.init(params),
            aux_opt=self.aux_tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
            d_params=d_params,
            d_opt=d_opt,
        )

        if self.gan:
            step_fn = make_gan_step(
                self.module, self.disc, self.losses,
                self.g_tx, self.aux_tx, self.d_tx, policy, oasis=self.oasis,
                mc_sampling=trainer_cfg.get("mc_sampling", False),
                y_hat_cond=trainer_cfg.get("y_hat_cond", False),
                lpips_fn=self.lpips_fn)
        else:
            step_fn = make_rd_step(self.module, self.losses, self.g_tx,
                                   self.aux_tx, policy,
                                   lpips_fn=self.lpips_fn)

        from ..parallel.mesh import best_mesh_size, fsdp_sharding_tree
        self.mesh = make_mesh(best_mesh_size(self.batch_size))
        # fsdp: true in the yaml shards params + optimizer moments over the
        # mesh (ZeRO-3 via GSPMD shardings) instead of replicating them —
        # for models/optimizer states that outgrow a single chip's HBM.
        self.state_shardings = (
            fsdp_sharding_tree(self.state, self.mesh)
            if opt.get("fsdp") and self.mesh.devices.size > 1 else None)
        self.step_fn = data_parallel_step(
            step_fn, self.mesh, state_shardings=self.state_shardings)
        self.state = self._place_state(self.state)

        # resume / cross-exp load (ref: base_trainer.py:36-42)
        if opt.get("load_checkpoint"):
            self._load_checkpoint(dict(opt["load_checkpoint"]))
        elif opt.get("start_iter", 0) > 0:
            self._resume_same_exp(int(opt["start_iter"]))
        self.saver = Saver(self.paths.model_dir, opt.get("keep_step") or ())

    def _place_state(self, state):
        """Put a host/single-device state onto the mesh: replicated, or
        FSDP-sharded when `fsdp: true` (fresh buffers either way — the
        placed state is consumed by the donating step)."""
        if self.state_shardings is not None:
            from ..parallel.mesh import shard_state
            return shard_state(state, self.mesh, self.state_shardings)
        return replicate(state, self.mesh)

    def _set_loggers(self):
        loss_fields = ["iter", "total", "bpp", "distortion", "skipped"]
        if self.gan:
            loss_fields += ["adv", "d_loss"]
        self.loss_csv = CSVLogger(self.paths.loss_csv_path, loss_fields)
        self.eval_csv = CSVLogger(self.paths.eval_csv_path,
                                  ["iter", "beta_rate", "beta_vq",
                                   "bpp", "psnr", "ms_ssim", "vq_acc"])
        self.meter = AvgMeter()
        # optional wandb sink (ref: base_trainer.py:85-99)
        self._wandb = None
        if self.opt.get("use_wandb"):
            try:
                import wandb
                wandb.init(project=self.opt.get("project_name", "dc_vic"),
                           name=self.opt.get("exp"),
                           config=self.opt.to_plain()
                           if hasattr(self.opt, "to_plain") else dict(self.opt))
                self._wandb = wandb
            except ImportError:
                self.logger.warning("use_wandb set but wandb not installed")

    def _resume_same_exp(self, start_iter: int):
        """Resume this experiment from its own checkpoints at start_iter
        (ref: base_trainer.py:36-37), restoring optimizer state + step when
        a training_state checkpoint exists."""
        host = jax.device_get(self.state)
        mp = self.paths.checkpoint_path("comp_model", start_iter)
        if not os.path.exists(mp):
            self.logger.warning(f"resume requested but missing {mp}")
            return
        params = Saver.load(mp, host.params)
        new_state = host.replace(params=params,
                                 step=jnp.asarray(start_iter, jnp.int32))
        tp = self.paths.checkpoint_path("training_state", start_iter)
        if os.path.exists(tp):
            raw = Saver.load(tp)
            new_state = new_state.replace(
                g_opt=serialization.from_state_dict(host.g_opt, raw["g_opt"]),
                aux_opt=serialization.from_state_dict(host.aux_opt,
                                                      raw["aux_opt"]))
            if self.gan and "d_opt" in raw:
                new_state = new_state.replace(
                    d_opt=serialization.from_state_dict(host.d_opt,
                                                        raw["d_opt"]))
        dp = self.paths.checkpoint_path("discriminator", start_iter)
        if self.gan and os.path.exists(dp):
            new_state = new_state.replace(
                d_params=Saver.load(dp, host.d_params))
        self.state = self._place_state(new_state)
        self.logger.info(f"resumed {self.opt.get('exp')} at iter {start_iter}")

    @staticmethod
    def _partial_restore(target, raw, logger, label: str):
        """torch load_state_dict(strict=False) analog: copy leaves whose path
        exists in both trees with matching shapes; keep fresh init elsewhere;
        log missing/unexpected keys (ref: rate_distortion_vq_code_trainer.py
        :249-251 strict=strict)."""
        from flax import traverse_util
        tgt_state = serialization.to_state_dict(target)
        flat_t = traverse_util.flatten_dict(tgt_state)
        flat_r = traverse_util.flatten_dict(raw)
        merged, loaded = {}, 0
        for k, v in flat_t.items():
            r = flat_r.get(k)
            if r is not None and getattr(r, "shape", None) == getattr(
                    v, "shape", None):
                merged[k] = r
                loaded += 1
            else:
                merged[k] = v
        missing = [k for k in flat_t if k not in flat_r]
        unexpected = [k for k in flat_r if k not in flat_t]
        if missing:
            logger.warning(f"{label}: {len(missing)} missing keys "
                           f"(kept init), e.g. {'/'.join(missing[0])}")
        if unexpected:
            logger.warning(f"{label}: {len(unexpected)} unexpected ckpt keys "
                           f"ignored, e.g. {'/'.join(unexpected[0])}")
        logger.info(f"{label}: loaded {loaded}/{len(flat_t)} leaves")
        return serialization.from_state_dict(
            target, traverse_util.unflatten_dict(merged))

    def _load_checkpoint(self, cfg: Dict):
        """Cross-experiment curriculum load with the reference's knobs
        (ref: dual_cond_gan_distortion_vq_code_trainer.py:348-431,
        rate_distortion_vq_code_trainer.py:216-276; used by
        config/exp1_stage1_2.yaml:6-13 etc.):
          exp/iter (or explicit path=...)  which checkpoint
          strict                           partial param load when False
          load_optimizer                   carry g/aux(/d) optimizer state
          load_scheduler                   False -> restart LR schedule at 0
          load_discriminator               warm-start D (+ its optimizer)
          new_g_lr / new_d_lr              LR override (applied at build time,
                                           see _set_state_and_step)
        """
        cfg = dict(cfg)
        exp, itr = cfg.get("exp"), cfg.get("iter")
        if exp is not None:
            ph = PathHandler(self.opt.get("ckpt_root", "./checkpoint"), exp)
            model_path = ph.checkpoint_path("comp_model", int(itr))
            optim_path = ph.checkpoint_path("training_state", int(itr))
            disc_path = ph.checkpoint_path("discriminator", int(itr))
        else:
            model_path = cfg.get("path") or cfg.get("load_path")
            optim_path = cfg.get("training_state_path")
            disc_path = cfg.get("discriminator_path")
        strict = cfg.get("strict", True)
        load_optimizer = cfg.get("load_optimizer", True)
        load_scheduler = cfg.get("load_scheduler", True)
        load_discriminator = cfg.get("load_discriminator", True)

        if not model_path or not os.path.exists(model_path):
            self.logger.warning(f"load_checkpoint path missing: {model_path}")
            return
        host = jax.device_get(self.state)

        raw = Saver.load(model_path)
        if strict:
            params = serialization.from_state_dict(host.params, raw)
        else:
            params = self._partial_restore(host.params, raw, self.logger,
                                           "comp_model")
        new_state = host.replace(params=params)
        self.logger.info(f"loaded comp_model weights from {model_path}")

        raw_ts = None
        if load_optimizer and optim_path and os.path.exists(optim_path):
            raw_ts = Saver.load(optim_path)
            g_opt = serialization.from_state_dict(host.g_opt, raw_ts["g_opt"])
            aux_opt = serialization.from_state_dict(host.aux_opt,
                                                    raw_ts["aux_opt"])
            if not load_scheduler:
                g_opt = reset_schedule_counts(g_opt)
            new_state = new_state.replace(g_opt=g_opt, aux_opt=aux_opt)
            self.logger.info(f"loaded optimizer state from {optim_path}"
                             + ("" if load_scheduler else " (scheduler reset)"))
        elif load_optimizer:
            self.logger.warning(
                f"load_optimizer set but missing {optim_path}")
        else:
            self.logger.warning("optimizer/scheduler NOT loaded")

        if self.gan and load_discriminator:
            if disc_path and os.path.exists(disc_path):
                new_state = new_state.replace(
                    d_params=Saver.load(disc_path, host.d_params))
                self.logger.info(f"loaded discriminator from {disc_path}")
                if raw_ts is not None and "d_opt" in raw_ts:
                    d_opt = serialization.from_state_dict(host.d_opt,
                                                          raw_ts["d_opt"])
                    if not load_scheduler:
                        d_opt = reset_schedule_counts(d_opt)
                    new_state = new_state.replace(d_opt=d_opt)
            else:
                self.logger.warning(
                    f"load_discriminator set but missing {disc_path}")
        elif self.gan:
            self.logger.warning("discriminator NOT loaded")

        self.state = self._place_state(new_state)

    # ------------------------------------------------------------------
    def train_loop(self):
        opt = self.opt
        total_iter = opt.get("total_iter", 500000)
        start_iter = opt.get("start_iter", 0)
        log_step = opt.get("log_step", 100)
        eval_step = opt.get("eval_step", 10000)
        save_step = opt.get("save_step", 5000)

        timer = Timer(start_iter, total_iter)
        data_iter = self.train_loader.infinite()
        bolded_log(f"training {opt.get('exp')} [{start_iter}..{total_iter}]")

        for itr in range(start_iter + 1, total_iter + 1):
            batch = next(data_iter)
            x = shard_batch(jnp.asarray(batch["real_images"]), self.mesh)
            self.state, metrics = self.step_fn(self.state, x)
            self.meter.update({k: float(v) for k, v in metrics.items()
                               if jnp.ndim(v) == 0})

            if itr % log_step == 0:
                avg = self.meter.pop()
                stat = timer.get_time_stat(itr)
                self.logger.info(
                    f"iter {itr} " +
                    " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())) +
                    f" ({stat['time_per_iter']:.3f}s/it eta {stat['eta_hours']:.1f}h)")
                self.loss_csv.write({"iter": itr, **avg})
                if self._wandb is not None:
                    self._wandb.log({f"loss/{k}": v for k, v in avg.items()},
                                    step=itr)

            if itr % eval_step == 0:
                self.validate(itr)

            if itr % save_step == 0:
                self.save(itr)

    # ------------------------------------------------------------------
    def _beta_eval_grid(self):
        """Beta corners for validation (ref: dual_cond_rate_distortion
        trainer :202-233 validates at the 4 (0/max) corners)."""
        if not self.module.use_beta:
            return [None]
        br, bv = self.policy.max_beta_rate, self.policy.max_beta_vq
        return [(0.0, 0.0), (0.0, bv), (br, 0.0), (br, bv)]

    def validate(self, itr: int, max_samples: int = 24):
        """Kodak bpp/PSNR/MS-SSIM/vq_acc at the beta-grid corners."""
        params = self.state.params
        fwd = self._jit_eval_fwd()
        avg = {}
        for corner in self._beta_eval_grid():
            rows = []
            for i, batch in enumerate(self.eval_loader.eval_batches()):
                if i >= max_samples:
                    break
                x = pad_image(jnp.asarray(batch["real_images"]))
                if corner is None:
                    out = fwd(params, x)
                else:
                    out = fwd(params, x, jnp.array([corner[0]]),
                              jnp.array([corner[1]]))
                H, W = batch["real_images"].shape[1:3]
                fake = np.asarray(out["fake_images"])[:, :H, :W]
                real = batch["real_images"]
                rows.append(dict(
                    bpp=float(out["qbpp"]),
                    psnr=calc_psnr(real, fake),
                    ms_ssim=calc_ms_ssim(real, fake),
                    vq_acc=float(out["vq_accuracy"]),
                ))
            cavg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]} \
                if rows else {}
            tag = "" if corner is None else f" beta=({corner[0]},{corner[1]})"
            self.logger.info(f"[eval iter {itr}]{tag} " +
                             " ".join(f"{k}={v:.4f}" for k, v in cavg.items()))
            # one CSV row per beta corner, preserving the full rate/VQ
            # trade-off curve over training (ref: dual_cond_rate_distortion
            # trainer :202-233 records every corner).
            brow = ({"beta_rate": "", "beta_vq": ""} if corner is None else
                    {"beta_rate": corner[0], "beta_vq": corner[1]})
            self.eval_csv.write({"iter": itr, **brow, **cavg})
            if self._wandb is not None:
                suffix = "" if corner is None else \
                    f"/b{corner[0]:g}_{corner[1]:g}"
                self._wandb.log({f"eval{suffix}/{k}": v
                                 for k, v in cavg.items()}, step=itr)
            avg = cavg
        return avg

    _eval_fwd_cache: Optional[Any] = None

    def _jit_eval_fwd(self):
        if self._eval_fwd_cache is None:
            if self.module.use_beta:
                self._eval_fwd_cache = jax.jit(
                    lambda p, x, b1, b2: self.module.apply(
                        p, x, b1, b2, is_train=False))
            else:
                self._eval_fwd_cache = jax.jit(
                    lambda p, x: self.module.apply(p, x, is_train=False))
        return self._eval_fwd_cache

    def save(self, itr: int):
        host_state = jax.device_get(self.state)
        training_state = {"g_opt": host_state.g_opt,
                          "aux_opt": host_state.aux_opt,
                          "step": host_state.step}
        tree = {"comp_model": host_state.params,
                "training_state": training_state}
        if self.gan:
            # GAN stages always persist D + its optimizer so the next
            # curriculum stage can warm-start it (ref: dual_cond_gan
            # trainer :320-346 — discriminator + d_optimizer are always
            # part of the stage checkpoint).
            tree["discriminator"] = host_state.d_params
            training_state["d_opt"] = host_state.d_opt
        paths = self.saver.save(tree, itr)
        self.logger.info(f"saved checkpoint at iter {itr}: {paths[0]}")


@TRAINER_REGISTRY.register()
def RateDistortionVqCodeTrainer(opt):
    return Trainer(opt, gan=False)


@TRAINER_REGISTRY.register()
def DualBetaCondRateDistortionVqCodeTrainer(opt):
    return Trainer(opt, gan=False)


@TRAINER_REGISTRY.register()
def DualBetaCondGanDistortionVqCodeTrainer(opt):
    return Trainer(opt, gan=True)


@TRAINER_REGISTRY.register()
def DualBetaCondOasisGanDistortionVqFusionTrainer(opt):
    return Trainer(opt, gan=True, oasis=True)


def build_trainer(opt) -> Trainer:
    """(ref: src/trainer/__init__.py:10-20)"""
    ttype = opt["trainer"]["type"]
    return TRAINER_REGISTRY.get(ttype)(opt)
