"""Loss semantics tests, cross-checked against torch where available."""
import numpy as np
import pytest

from dc_vic_tpu.train.losses import build_loss


def test_rate_loss():
    import jax.numpy as jnp
    loss = build_loss({"type": "RateLoss", "loss_weight": 0.04})
    assert float(loss(jnp.array([1.0, 3.0]))) == pytest.approx(0.04 * 2.0)


def test_mse_loss_range_normalized():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    loss = build_loss({"type": "MSELoss", "loss_weight": 50,
                       "normalize_img": True, "mse_scale": "0_1"})
    # maps [-1,1] -> [0,1]: mse scales by 1/4
    expected = 50 * np.mean((np.asarray(a) / 2 - np.asarray(b) / 2) ** 2)
    assert float(loss(a, b)) == pytest.approx(expected, rel=1e-5)


def test_focal_ce_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    target = rng.integers(0, 8, (2, 4, 4))
    gamma, w = 2.0, 0.05

    loss = build_loss({"type": "FocalCrossEntropyLoss", "gamma": gamma,
                       "loss_weight": w})
    ours = float(loss(jnp.asarray(logits), jnp.asarray(target)))

    with torch.no_grad():
        lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(target)
        ce = torch.nn.functional.cross_entropy(lt, tt, reduction="none")
        pt = torch.softmax(lt, 1).gather(1, tt.unsqueeze(1)).squeeze(1)
        ref = w * (((1 - pt) ** gamma) * ce).mean().item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_vanilla_gan_loss_matches_torch_bce():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
    loss = build_loss({"type": "VanillaGANLoss", "loss_weight": 0.01})

    with torch.no_grad():
        xt = torch.from_numpy(x)
        ref_real = torch.nn.functional.binary_cross_entropy_with_logits(
            xt, torch.ones_like(xt)).item()
        ref_fake = torch.nn.functional.binary_cross_entropy_with_logits(
            xt, torch.zeros_like(xt)).item()

    assert float(loss(jnp.asarray(x), is_real=True, is_disc=True)) == \
        pytest.approx(ref_real, rel=1e-5)
    assert float(loss(jnp.asarray(x), is_real=False, is_disc=True)) == \
        pytest.approx(ref_fake, rel=1e-5)
    # generator loss is weighted
    assert float(loss(jnp.asarray(x), is_real=True, is_disc=False)) == \
        pytest.approx(0.01 * ref_real, rel=1e-5)


def test_oasis_gan_loss_classes():
    import jax.numpy as jnp
    loss = build_loss({"type": "OasisGANLoss", "loss_weight": 0.01})
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 4, 4, 9)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 8, (1, 4, 4)))
    real = float(loss(logits, target, is_disc=True, is_real=True))
    fake = float(loss(logits, target, is_disc=True, is_real=False))
    assert np.isfinite(real) and np.isfinite(fake)
    # fake target is class 0 regardless of tokens
    fake2 = float(loss(logits, target * 0 + 5, is_disc=True, is_real=False))
    assert fake == pytest.approx(fake2)


def test_ms_ssim_sanity():
    import jax.numpy as jnp
    from dc_vic_tpu.metrics.image import ms_ssim
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    same = float(ms_ssim(x, x)[0])
    assert same == pytest.approx(1.0, abs=1e-4)
    noisy = jnp.clip(x + 0.25 * jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    assert float(ms_ssim(x, noisy)[0]) < 0.95
