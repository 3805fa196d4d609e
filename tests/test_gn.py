"""ops/gn.py: the Pallas GroupNorm-stats lowering vs flax nn.GroupNorm.

CPU runs exercise the XLA fallback directly and the kernel via Pallas
interpret mode; on-chip equivalence is covered by the recon parity the
codec roundtrip asserts (the same module drives reconstruct_uint8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dc_vic_tpu.nn.layers import GroupNorm, num_groups32
from dc_vic_tpu.ops import gn


def _flax_gn(x, gamma, beta, groups, dtype=None):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype).apply(
        {"params": {"scale": gamma, "bias": beta}}, x)


@pytest.mark.parametrize("shape,groups", [
    ((2, 24, 16, 64), 32),
    ((3, 8, 8, 96), 32),    # C not a multiple of 128
    ((1, 5, 7, 12), 4),     # odd spatial, fallback path
])
def test_group_norm_matches_flax_f32(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, jnp.float32)
    C = shape[-1]
    gamma = jnp.asarray(rng.standard_normal(C) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ref = _flax_gn(x, gamma, beta, groups)
    out = gn.group_norm(x, gamma, beta, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_norm_bf16_matches_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.bfloat16)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    ref = np.asarray(_flax_gn(x, gamma, beta, 32, jnp.bfloat16), np.float32)
    out = np.asarray(gn.group_norm(x, gamma, beta, 32), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_kernel_interpret_matches_fallback():
    """The Pallas kernel itself (interpret mode on CPU) against the XLA
    fallback channel_sums at a kernel-qualified shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    B, H, W, C = 2, 64, 32, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    T = gn._h_tile(H, W, C, 4)
    assert H % T == 0 and T > 1
    out = pl.pallas_call(
        gn._gn_stats_kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        interpret=True,
    )(x)[:, :2, :]
    ref = gn.channel_sums(x)  # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_gn_modes_agree(monkeypatch):
    """xla2 / flax / pallas-fallback stats produce the same (mean, var)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 64)) * 1.5, jnp.float32)
    outs = {}
    for mode in ("xla2", "flax"):
        monkeypatch.setenv("DCVIC_GN", mode)
        outs[mode] = gn.gn_stats(x, 32)
    for a, b in zip(outs["xla2"], outs["flax"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_module_param_tree_matches_flax():
    """GroupNorm (ours) and nn.GroupNorm produce interchangeable params."""
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    p_ours = GroupNorm(num_groups=32).init(jax.random.PRNGKey(0), x)
    p_flax = nn.GroupNorm(num_groups=32).init(jax.random.PRNGKey(0), x)
    ours = jax.tree_util.tree_structure(p_ours)
    flax_t = jax.tree_util.tree_structure(p_flax)
    assert ours == flax_t
    out_a = GroupNorm(num_groups=32).apply(p_flax, x)
    out_b = nn.GroupNorm(num_groups=32).apply(p_flax, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)


def test_h_tile_divides():
    for h, w in ((768, 512), (384, 256), (192, 128), (96, 64), (48, 20)):
        for c in (128, 256, 512):
            t = gn._h_tile(h, w, c, 2)
            assert h % t == 0
            assert t * w * c * 2 <= gn._BLOCK_BYTES
