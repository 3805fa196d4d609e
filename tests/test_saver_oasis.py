"""Saver retention semantics + OASIS GAN step."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_config

from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.train.saver import Saver


def test_saver_keep_and_delete(tmp_path):
    saver = Saver(str(tmp_path), keep_steps=[20])
    tree = {"comp_model": {"w": np.ones(3)}}
    p10 = saver.save(tree, 10)[0]
    assert os.path.exists(p10)
    p20 = saver.save(tree, 20)[0]          # keep step
    assert not os.path.exists(p10)         # previous non-keep deleted
    p30 = saver.save(tree, 30)[0]
    p40 = saver.save(tree, 40)[0]
    assert os.path.exists(p20)             # keep survived
    assert not os.path.exists(p30)         # non-keep rolled
    assert os.path.exists(p40)

    loaded = Saver.load(p40, {"w": np.zeros(3)})
    np.testing.assert_array_equal(loaded["w"], np.ones(3))


def test_oasis_gan_step():
    from dc_vic_tpu.models.discriminators import (
        OasisDualBetaCondTamingNLayerDiscriminator)
    from dc_vic_tpu.train.losses import build_loss
    from dc_vic_tpu.train.optim import build_optimizer
    from dc_vic_tpu.train.steps import BetaPolicy, TrainState, make_gan_step

    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, x[:1], beta, beta, is_train=False))(rng)

    losses = {
        "distortion_loss": build_loss({"type": "MSELoss", "loss_weight": 50,
                                       "normalize_img": True,
                                       "mse_scale": "0_1"}),
        "gan_loss": build_loss({"type": "OasisGANLoss", "loss_weight": 0.01}),
    }
    disc = OasisDualBetaCondTamingNLayerDiscriminator(
        ndf=8, n_embed=32, n_layers=2, cond_ch=4, L=4, norm_type="none")
    d_params = jax.jit(lambda r: disc.init(r, x, beta, beta))(
        jax.random.PRNGKey(7))
    # per-pixel logits on the token grid
    logits = disc.apply(d_params, x, beta, beta)
    assert logits.shape == (2, 8, 8, 33)

    g_tx = build_optimizer({"type": "Adam", "lr": 1e-4})
    aux_tx = build_optimizer({"type": "Adam", "lr": 1e-3})
    d_tx = build_optimizer({"type": "Adam", "lr": 1e-4})
    state = TrainState(params=params, g_opt=g_tx.init(params),
                       aux_opt=aux_tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(1),
                       d_params=d_params, d_opt=d_tx.init(d_params))
    step = jax.jit(make_gan_step(spec.module, disc, losses, g_tx, aux_tx,
                                 d_tx, BetaPolicy(use_beta=True), oasis=True))
    s1, m = step(state, x)
    assert np.isfinite(float(m["total"]))
    assert np.isfinite(float(m["d_loss"]))
    assert float(m["skipped"]) == 0.0
