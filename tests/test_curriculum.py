"""Cross-experiment curriculum checkpoint handoff
(ref: base_trainer.py:39-42, config/exp1_stage1_2.yaml:6-13,
dual_cond_gan_distortion_vq_code_trainer.py:348-431).

Exercises the full Trainer: stage A (RD) trains a step and saves; stage B
(GAN) boots from stage A's checkpoint with the reference knobs
(load_optimizer / load_scheduler / new_g_lr / strict); stage C warm-starts
stage B's discriminator."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from helpers import tiny_config

from dc_vic_tpu.train.optim import build_optimizer, reset_schedule_counts
from dc_vic_tpu.train.trainer import Trainer, build_trainer
from dc_vic_tpu.utils.config import Config

# Compile-heavy (subprocess / portable-matrix / mesh) — excluded from the
# dev profile `pytest -m 'not slow'` (VERDICT r4 #9); CI runs everything.
pytestmark = pytest.mark.slow


def _make_images(root, n=4, size=72):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"img{i}.png"))


def _full_opt(tmp_path, exp, trainer_type, gan=False, load_checkpoint=None):
    cfg = tiny_config()
    train_dir = os.path.join(str(tmp_path), "data", "train_0")
    eval_dir = os.path.join(str(tmp_path), "data", "kodak")
    if not os.path.isdir(train_dir):
        _make_images(train_dir)
        _make_images(eval_dir, n=1)
    extra = {
        "exp": exp,
        "ckpt_root": os.path.join(str(tmp_path), "ckpt"),
        "seed": 0,
        "trainer": {"type": trainer_type, "beta_policy": "exp",
                    "sample_beta_batch": True},
        "dataset": {
            "batch_size": 2,
            "train_dataset": {"name": "openimage", "type": "ImageDataset",
                              "root_dir": os.path.dirname(train_dir),
                              "subset_list": [0], "image_size": 64},
            "eval_dataset": {"name": "Kodak", "type": "ImageDataset",
                             "root_dir": eval_dir},
        },
        "optim": {
            "g_optimizer": {"type": "Adam", "lr": 1e-4},
            "g_scheduler": {"type": "MultiStepLR", "milestones": [100],
                            "gamma": 0.5},
            "aux_optimizer": {"type": "Adam", "lr": 1e-3},
            "clip_max_norm": 1.0,
        },
        "loss": {
            "rate_loss": {"type": "RateLoss", "loss_weight": 0.04},
            "distortion_loss": {"type": "MSELoss", "loss_weight": 50,
                                "normalize_img": True, "mse_scale": "0_1"},
        },
    }
    if gan:
        extra["loss"] = {
            "distortion_loss": extra["loss"]["distortion_loss"],
            "gan_loss": {"type": "VanillaGANLoss", "loss_weight": 0.01},
        }
        extra["discriminator"] = {
            "type": "DualBetaCondTamingNLayerDiscriminator",
            "ndf": 8, "n_layers": 2, "cond_ch": 4, "L": 4,
            "norm_type": "none"}
    if load_checkpoint:
        extra["load_checkpoint"] = load_checkpoint
    merged = dict(cfg)
    merged.update(extra)
    return Config._wrap(merged)


def _flat_schedule_counts(opt_state):
    counts = []

    def rec(x):
        if isinstance(x, optax.ScaleByScheduleState):
            counts.append(int(x.count))
        elif isinstance(x, tuple):
            for v in x:
                rec(v)
        elif isinstance(x, (list, dict)):
            for v in (x.values() if isinstance(x, dict) else x):
                rec(v)

    rec(opt_state)
    return counts


@pytest.fixture(scope="module")
def stage_a(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("curriculum")
    opt = _full_opt(tmp_path, "expA", "RateDistortionVqCodeTrainer")
    tr = build_trainer(opt)
    # one real train step so the optimizer state is non-trivial
    batch = next(tr.train_loader.infinite())
    from dc_vic_tpu.parallel import shard_batch
    x = shard_batch(jnp.asarray(batch["real_images"]), tr.mesh)
    tr.state, metrics = tr.step_fn(tr.state, x)
    assert np.isfinite(float(metrics["total"]))
    tr.save(10)
    return tmp_path, tr


def test_stage_a_saves(stage_a):
    tmp_path, tr = stage_a
    mdir = os.path.join(str(tmp_path), "ckpt", "expA", "model")
    assert os.path.exists(os.path.join(mdir, "comp_model_iter10.ckpt"))
    assert os.path.exists(os.path.join(mdir, "training_state_iter10.ckpt"))


def test_stage_b_boot_from_a(stage_a):
    """stage1_1 -> stage1_2 style handoff: params + optimizer carried, new
    LR, scheduler restarted (exp1_stage3.yaml-style knob combination)."""
    tmp_path, tra = stage_a
    opt = _full_opt(tmp_path, "expB",
                    "DualBetaCondGanDistortionVqCodeTrainer", gan=True,
                    load_checkpoint={"exp": "expA", "iter": 10,
                                     "load_optimizer": True,
                                     "load_scheduler": False,
                                     "load_discriminator": False,
                                     "new_g_lr": 5e-5, "strict": True})
    trb = build_trainer(opt)

    # params transferred bit-exactly
    pa = jax.device_get(tra.state.params)
    pb = jax.device_get(trb.state.params)
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    assert len(la) == len(lb)
    assert all(np.array_equal(a, b) for a, b in zip(la, lb))

    # adam moments carried over (stage A took a step -> nonzero mu)
    def mu_norm(opt_state):
        tot = 0.0
        for leaf in jax.tree_util.tree_leaves(jax.device_get(opt_state)):
            tot += float(np.sum(np.abs(np.asarray(leaf, np.float64))))
        return tot
    assert mu_norm(trb.state.g_opt) > 0.0

    # scheduler restarted at 0 even though adam count advanced
    assert all(c == 0 for c in _flat_schedule_counts(
        jax.device_get(trb.state.g_opt)))

    # GAN stage checkpoints always include D + d_opt
    trb.save(20)
    mdir = os.path.join(str(tmp_path), "ckpt", "expB", "model")
    assert os.path.exists(os.path.join(mdir, "discriminator_iter20.ckpt"))

    # stage C warm-starts B's discriminator (exp1_stage3.yaml knobs)
    optc = _full_opt(tmp_path, "expC",
                     "DualBetaCondGanDistortionVqCodeTrainer", gan=True,
                     load_checkpoint={"exp": "expB", "iter": 20,
                                      "load_optimizer": True,
                                      "load_scheduler": False,
                                      "load_discriminator": True,
                                      "new_g_lr": 1e-4, "new_d_lr": 1e-4,
                                      "strict": True})
    trc = build_trainer(optc)
    db = jax.tree_util.tree_leaves(jax.device_get(trb.state.d_params))
    dc = jax.tree_util.tree_leaves(jax.device_get(trc.state.d_params))
    assert all(np.array_equal(a, b) for a, b in zip(db, dc))


def test_partial_restore_strict_false():
    """strict=False keeps fresh init for missing keys and ignores unexpected
    ones (torch load_state_dict(strict=False) semantics)."""
    import logging
    target = {"params": {"a": np.zeros((2, 2), np.float32),
                         "b": np.zeros((3,), np.float32)}}
    raw = {"params": {"a": np.ones((2, 2), np.float32),
                      "zz": np.ones((5,), np.float32)}}
    out = Trainer._partial_restore(target, raw, logging.getLogger("t"),
                                   "unit")
    np.testing.assert_array_equal(out["params"]["a"], 1.0)
    np.testing.assert_array_equal(out["params"]["b"], 0.0)


def test_reset_schedule_counts_keeps_adam():
    tx = build_optimizer({"type": "Adam", "lr": 1e-4},
                         {"type": "MultiStepLR", "milestones": [10],
                          "gamma": 0.1}, 1.0)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    for _ in range(3):
        g = {"w": jnp.ones((3,))}
        _, state = tx.update(g, state, params)
    before = _flat_schedule_counts(state)
    assert any(c > 0 for c in before)
    after_state = reset_schedule_counts(state)
    assert all(c == 0 for c in _flat_schedule_counts(after_state))
    # adam's own count (bias correction) is preserved
    leaves = jax.tree_util.tree_leaves(
        after_state,
        is_leaf=lambda node: isinstance(node, optax.ScaleByAdamState))
    adam_counts = [int(x.count) for x in leaves
                   if isinstance(x, optax.ScaleByAdamState)]
    assert adam_counts and all(c == 3 for c in adam_counts)
