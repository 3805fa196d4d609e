"""Pallas 3x3 conv kernel: correctness (interpret mode) + VJP + dispatch.

On-chip performance/bit-level behavior is covered by
scripts/conv_microbench.py and the full-model selfcheck (docs/PERF.md);
here the kernel's logic runs through the Pallas interpreter on the CPU
mesh so CI without a TPU still exercises it, and the layers.Conv dispatch
gate is pinned.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("shape", [(2, 16, 128, 128, 128),
                                   (1, 8, 24, 256, 128),
                                   (2, 12, 16, 128, 256)])
def test_conv3x3_matches_xla(interpret_pallas, shape):
    from dc_vic_tpu.ops.conv3x3 import conv3x3_same
    B, H, W, C, Cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.05, jnp.float32)
    out = conv3x3_same(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w)),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_grad_flows(interpret_pallas):
    """custom_vjp delegates backward to XLA's conv gradients."""
    from dc_vic_tpu.ops.conv3x3 import conv3x3_same
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    g_pallas = jax.grad(lambda x, w: jnp.sum(conv3x3_same(x, w) ** 2),
                        argnums=(0, 1))(x, w)
    g_ref = jax.grad(lambda x, w: jnp.sum(_ref(x, w) ** 2),
                     argnums=(0, 1))(x, w)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


def test_dispatch_gate():
    """layers.Conv routes to Pallas only on TPU with lane-aligned wide
    channels and a big-enough plane; never on the CPU test mesh."""
    from dc_vic_tpu.nn.layers import _use_pallas_conv3
    x = jnp.zeros((16, 96, 64, 512))
    # CPU backend in tests -> always off
    assert not _use_pallas_conv3(x, 512)


@pytest.mark.parametrize("with_res", [False, True])
def test_fused_gn_swish_conv_matches_ref(interpret_pallas, with_res):
    """conv3x3_gn_swish == swish(x*scale+bias) -> conv -> +cbias (+res),
    including the halo re-zeroing (the affine makes pad positions nonzero;
    the kernel must restore SAME-conv zero-pad semantics)."""
    from dc_vic_tpu.ops.conv3x3 import _xla_fused_ref, conv3x3_gn_swish
    rng = np.random.default_rng(2)
    B, H, W, C, Cout = 2, 8, 24, 128, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (B, C)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    cbias = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    res = (jnp.asarray(rng.standard_normal((B, H, W, Cout)), jnp.float32)
           if with_res else None)
    out = conv3x3_gn_swish(x, w, scale, bias, cbias, res)
    ref = _xla_fused_ref(x, w, scale, bias, cbias, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_gn_swish_conv_grad(interpret_pallas):
    from dc_vic_tpu.ops.conv3x3 import _xla_fused_ref, conv3x3_gn_swish
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 8, 16, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    scale = jnp.ones((B, C), jnp.float32)
    bias = jnp.zeros((B, C), jnp.float32)
    cbias = jnp.zeros((C,), jnp.float32)
    loss = lambda f: lambda x, w: jnp.sum(f(x, w, scale, bias, cbias, None) ** 2)
    gp = jax.grad(loss(conv3x3_gn_swish), argnums=(0, 1))(x, w)
    gr = jax.grad(loss(_xla_fused_ref), argnums=(0, 1))(x, w)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("out_ch", [128, 256])
def test_fused_resblock_matches_unfused(interpret_pallas, monkeypatch,
                                        out_ch):
    """The fused VQResnetBlock path computes the same function as the
    unfused one with the SAME parameter tree (checkpoints interchange)."""
    from dc_vic_tpu.models import vqgan
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 24, 128)) * 0.7, jnp.float32)
    block = vqgan.VQResnetBlock(out_ch=out_ch)
    params = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(params, x)
    monkeypatch.setattr(vqgan, "_use_fused_resblock", lambda *a: True)
    out = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_dispatch_param_tree_identical():
    """PallasConv3 and nn.Conv produce the same parameter tree, so a
    checkpoint initialized on CPU (XLA path) loads on TPU (Pallas path)."""
    from flax import linen as nn

    from dc_vic_tpu.nn.layers import Conv, PallasConv3
    x = jnp.zeros((1, 8, 8, 128))
    xla_params = Conv(128, 3).init(jax.random.PRNGKey(0), x)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return PallasConv3(128, name="Conv_0")(x)

    import functools as ft

    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        pallas_params = Wrap().init(jax.random.PRNGKey(0), x)
    finally:
        pl.pallas_call = orig
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), xla_params)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), pallas_params)
    assert jax.tree_util.tree_structure(t1) == jax.tree_util.tree_structure(t2)
    assert t1 == t2

def test_int8_conv_quantization_accuracy():
    """Int8Conv3 approximates the f32 conv: per-tensor activation +
    per-channel weight symmetric quantization should land within ~1.5%
    relative error on well-conditioned inputs, with an identical
    parameter tree (checkpoints interchange with the f32/bf16 paths)."""
    from flax import linen as nn

    from dc_vic_tpu.nn.layers import Conv, Int8Conv3

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 128)), jnp.float32)
    ref_conv = Conv(128, 3)
    params = ref_conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(ref_conv.apply(params, x))

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Int8Conv3(128, name="Conv_0")(x)

    q_params = Wrap().init(jax.random.PRNGKey(0), x)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), params)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), q_params)
    assert jax.tree_util.tree_structure(t1) == \
        jax.tree_util.tree_structure(t2)
    assert t1 == t2

    out = np.asarray(Wrap().apply(params, x))
    err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.015, f"int8 quantization error too large: {err:.4f}"

    # Activation scales are per-sample: an outlier batchmate must not
    # change another image's quantized output (codec determinism — a
    # given image's reconstruction is independent of batch composition).
    outlier = jnp.concatenate([x[:1], 1000.0 * x[1:2]], axis=0)
    solo = np.asarray(Wrap().apply(params, x[:1]))
    batched = np.asarray(Wrap().apply(params, outlier))
    np.testing.assert_array_equal(batched[0], solo[0])


def test_int8_dispatch_gate():
    """DCVIC_INT8_CONV routes only on TPU — never on the CPU test mesh —
    and only for wide lane-aligned planes."""
    import os

    from dc_vic_tpu.nn.layers import _use_int8_conv
    x = jnp.zeros((16, 96, 64, 512))
    os.environ["DCVIC_INT8_CONV"] = "1"
    try:
        assert not _use_int8_conv(x, 512)  # CPU backend in tests
    finally:
        del os.environ["DCVIC_INT8_CONV"]
    assert not _use_int8_conv(x, 512)
