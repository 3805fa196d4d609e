"""Composite model tests: forward shapes, gradient flow, beta conditioning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.models import build_comp_model


@pytest.fixture(scope="module")
def built():
    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(
        lambda r, xx, b1, b2: spec.module.init({"params": r}, xx, b1, b2,
                                               is_train=False)
    )(rng, x, beta, beta)
    fwd_eval = jax.jit(
        lambda p, xx, b1, b2: spec.module.apply(p, xx, b1, b2, is_train=False))
    return spec, params, x, fwd_eval


def test_forward_eval_shapes(built):
    spec, params, x, fwd_eval = built
    beta = jnp.array([1.0])
    out = fwd_eval(params, x, beta, beta)
    assert out["fake_images"].shape == x.shape
    assert out["gt_vq_indices"].shape == (2, 8, 8)
    assert out["out_vq_logits"].shape == (2, 8, 8, 32)
    assert out["quantized_code"]["y"].shape == (2, 4, 4, 24)
    assert out["quantized_code"]["z"].shape == (2, 1, 1, 16)
    assert float(out["bpp"]) > 0
    assert float(out["qbpp"]) > 0
    assert 0.0 <= float(out["vq_accuracy"]) <= 1.0


def test_beta_changes_rate(built):
    """Different beta_rate must change the latent (the conditioning works)."""
    spec, params, x, fwd_eval = built
    lo = fwd_eval(params, x, jnp.array([0.0]), jnp.array([1.0]))
    hi = fwd_eval(params, x, jnp.array([3.0]), jnp.array([1.0]))
    assert not np.allclose(np.asarray(lo["latent_code"]["y"]),
                           np.asarray(hi["latent_code"]["y"]))


def test_forward_train_grads(built):
    spec, params, x, _ = built
    beta = jnp.array([1.0])
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            out = spec.module.apply(p, x, beta, beta, is_train=True, rng=rng)
            return (jnp.mean((out["fake_images"] - x) ** 2)
                    + out["bpp"]
                    + jnp.mean((out["out_vq_latent"] - out["gt_vq_latent"]) ** 2))
        return jax.grad(loss_fn)(p)

    g = grad_fn(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    enc_g = g["params"]["encoder"]
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(enc_g))
    assert total > 0


def test_fix_entropy_models_blocks_encoder_grads(built):
    """GAN stages: no grads through encoder/entropy branch
    (ref: dual_cond_gan trainer :126-131)."""
    spec, params, x, _ = built
    beta = jnp.array([1.0])
    rng = jax.random.PRNGKey(2)

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            out = spec.module.apply(p, x, beta, beta, is_train=True, rng=rng,
                                    fix_entropy_models=True)
            return jnp.mean((out["fake_images"] - x) ** 2)
        return jax.grad(loss_fn)(p)

    g = grad_fn(params)["params"]
    enc_total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g["encoder"]))
    dec_total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g["decoder"]))
    assert enc_total == 0.0
    assert dec_total > 0.0


def test_non_beta_non_charm_variant():
    spec = build_comp_model(tiny_config(use_charm=False, use_beta=False))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(
        lambda r, xx: spec.module.init({"params": r}, xx, is_train=False)
    )(rng, x)
    out = jax.jit(lambda p, xx: spec.module.apply(p, xx, is_train=False))(params, x)
    assert out["fake_images"].shape == x.shape
    assert float(out["bpp"]) > 0


def test_folded_upsample_matches_naive():
    """Upsample's single-2x2-conv depth-to-space formulation must equal the
    reference nearest-x2 + conv3x3 path (same params) to float tolerance."""
    import os

    from dc_vic_tpu.models.vqgan import Upsample

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 7, 5, 32), jnp.float32)
    params = Upsample().init(jax.random.PRNGKey(4), x)

    naive = Upsample().apply(params, x)
    os.environ["DCVIC_FOLDED_UPSAMPLE"] = "1"
    try:
        folded = Upsample().apply(params, x)
    finally:
        del os.environ["DCVIC_FOLDED_UPSAMPLE"]
    assert folded.shape == naive.shape == (2, 14, 10, 32)
    assert float(jnp.max(jnp.abs(folded - naive))) < 1e-5
