"""Alternative-component tests: EmbCat encoders / long_indices, GDN
autoencoders, mc_sampling GAN step, paramwise lr groups, same-exp resume."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.models import build_comp_model


def test_long_indices_embcat_encoder():
    cfg = tiny_config()
    cfg["model"]["enc_vq_input"] = "long_indices"
    cfg["subnet"]["encoder"] = {
        "type": "ElicDualBetaFtVqEmbCatEncoder",
        "out_ch": 24, "main_ch": 16, "block_mid_ch": 8, "num_blocks": 1,
        "max_beta_1": 3.0, "max_beta_2": 3.5, "cond_ch": 16, "L": 4,
        "use_pi": False, "include_x": True,
        "vq_n_embed": 32, "vq_ind_embed_dim": 8,
    }
    spec = build_comp_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, x, beta, beta, is_train=False))(rng)
    out = jax.jit(lambda p: spec.module.apply(p, x, beta, beta,
                                              is_train=False))(params)
    assert out["fake_images"].shape == x.shape
    assert "vq_ind_emb" in params["params"]["encoder"]


def test_gdn_autoencoder_roundtrip_shapes():
    import flax.linen as nn
    from dc_vic_tpu.models.alt_autoencoders import Balle18Decoder, Balle18Encoder

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    enc = Balle18Encoder(out_ch=32, main_ch=16)
    p = jax.jit(lambda r: enc.init(r, x))(rng)
    y = enc.apply(p, x)
    assert y.shape == (1, 4, 4, 32)
    dec = Balle18Decoder(out_ch=3, main_ch=16)
    pd = jax.jit(lambda r: dec.init(r, y))(rng)
    o = dec.apply(pd, y)
    assert o.shape == x.shape
    assert np.abs(np.asarray(o)).max() <= 1.0  # tanh


def test_gan_step_mc_sampling_and_y_hat_cond():
    from dc_vic_tpu.models.discriminators import (
        DualBetaCondTamingNLayerDiscriminator)
    from dc_vic_tpu.train.losses import build_loss
    from dc_vic_tpu.train.optim import build_optimizer
    from dc_vic_tpu.train.steps import BetaPolicy, TrainState, make_gan_step

    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, x[:1], beta, beta, is_train=False))(rng)

    losses = {
        "distortion_loss": build_loss({"type": "MSELoss", "loss_weight": 50,
                                       "normalize_img": True,
                                       "mse_scale": "0_1"}),
        "gan_loss": build_loss({"type": "VanillaGANLoss",
                                "loss_weight": 0.01}),
    }
    disc = DualBetaCondTamingNLayerDiscriminator(
        ndf=8, n_layers=2, cond_ch=4, L=4, norm_type="none",
        y_hat_cond=True, y_hat_out_ch=4)
    d_params = jax.jit(lambda r: disc.init(
        r, x[:2], beta, beta,
        y_hat=jnp.zeros((2, 4, 4, 24))))(jax.random.PRNGKey(7))
    g_tx = build_optimizer({"type": "Adam", "lr": 1e-4})
    aux_tx = build_optimizer({"type": "Adam", "lr": 1e-3})
    d_tx = build_optimizer({"type": "Adam", "lr": 1e-4})
    state = TrainState(params=params, g_opt=g_tx.init(params),
                       aux_opt=aux_tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(1),
                       d_params=d_params, d_opt=d_tx.init(d_params))
    step = jax.jit(make_gan_step(spec.module, disc, losses, g_tx, aux_tx,
                                 d_tx, BetaPolicy(use_beta=True),
                                 mc_sampling=True, y_hat_cond=True))
    s1, m = step(state, x)
    assert np.isfinite(float(m["total"]))
    assert np.isfinite(float(m["d_loss"]))


def test_paramwise_scale():
    from flax import traverse_util
    from dc_vic_tpu.train.optim import paramwise_scale

    params = {"params": {"encoder": {"w": jnp.ones(3)},
                         "decoder": {"w": jnp.ones(3)}}}
    tx = paramwise_scale({"encoder": 0.1})
    state = tx.init(params)
    ups, _ = tx.update(params, state)
    flat = traverse_util.flatten_dict(ups["params"])
    np.testing.assert_allclose(flat[("encoder", "w")], 0.1)
    np.testing.assert_allclose(flat[("decoder", "w")], 1.0)


def test_actnorm_data_dependent_init():
    """ActNorm (ref: taming/modules/util.py:10-62) initializes loc/scale from
    the init batch so it comes out zero-mean/unit-std per channel; a constant
    (zeros-dummy) init degrades to identity instead of exploding."""
    from dc_vic_tpu.models.discriminators import _Norm

    norm = _Norm("actnorm")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 8, 8, 6)) * 3.0 + 1.5
    params = norm.init(rng, x)
    out = norm.apply(params, x)
    np.testing.assert_allclose(np.mean(out, axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.std(out, axis=(0, 1, 2), ddof=1), 1.0,
                               atol=1e-3)

    zeros = jnp.zeros((2, 8, 8, 6))
    pz = norm.init(rng, zeros)
    np.testing.assert_allclose(np.asarray(pz["params"]["scale"]), 1.0)
    np.testing.assert_allclose(np.asarray(pz["params"]["loc"]), 0.0)
