"""Weight converter tests.

1. Mapping completeness + invertibility: flax params -> torch layout ->
   flax must round-trip exactly for every leaf of the shipped model family.
2. Semantic conv equivalence: the tensor transforms must make JAX modules
   compute the same function as the corresponding torch ops.
"""
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.models.convert import (
    PathMapper,
    convert_state_dict,
    export_state_dict,
    t_conv_inv,
    t_deconv_inv,
)


@pytest.fixture(scope="module")
def params():
    import jax
    import jax.numpy as jnp

    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    return jax.device_get(jax.jit(
        lambda r: spec.module.init({"params": r}, x, beta, beta,
                                   is_train=False))(rng))


def test_mapping_roundtrip_complete(params):
    """Every flax leaf must map to a unique torch key and convert back
    bit-exactly."""
    sd = export_state_dict(params)   # raises on unmapped paths
    from flax import traverse_util
    n_leaves = len(traverse_util.flatten_dict(params))
    # fused_decoder shares torch keys with vq_model.decoder only when the
    # vq_model has a decoder; here vq_model is encoder-only so all keys are
    # distinct.
    assert len(sd) == n_leaves

    back, report = convert_state_dict(sd, params, strict=True)
    flat_a = traverse_util.flatten_dict(params)
    flat_b = traverse_util.flatten_dict(back)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


def test_torch_key_names_follow_reference_layout(params):
    """Spot-check that generated torch keys match the reference's module
    attribute paths (ref: src/models/...)."""
    sd = export_state_dict(params)
    expected = [
        "encoder.conv1.weight",
        "encoder.beta_ft_list.0.shared.0.weight",
        "encoder.mlp.0.weight",
        "encoder.projection.bias",
        "encoder.attn2.trunk_block.0.c1.weight",
        "encoder.block1.block0.conv.0.weight",
        "decoder.init_fuse.scale.weight",
        "decoder.beta_ft_list.7.shift.bias",  # 8 + conv4 are dead (get_feats early-exits after block3)
        "hyperencoder.conv2.weight",
        "hyperdecoder.hd_mu.conv1.weight",
        "hyperdecoder.hd_std.conv3.bias",
        "context_model.mean_slice_transforms.0.model.0.weight",
        "context_model.lrp_slice_transforms.5.model.4.bias",
        "entropy_model_z._matrix0",
        "entropy_model_z.quantiles",
        "vq_estimator.first_block.0.weight",
        "vq_estimator.embed_projection.weight",
        "vq_estimator.swin_blks.0.residual_group.blocks.0.attn.qkv.weight",
        "vq_estimator.swin_blks.0.residual_group.blocks.0."
        "attn.relative_position_bias_table",
        "vq_estimator.out_block.1.weight",
        "vq_model.encoder.conv_in.weight",
        "vq_model.encoder.down.0.block.0.norm1.weight",
        "vq_model.encoder.mid.attn_1.q.weight",
        "vq_model.quantize.embedding.weight",
        "vq_model.quant_conv.weight",
        "vq_model.post_quant_conv.bias",
        "vq_model.decoder.conv_in.weight",        # via fused_decoder
        "vq_model.decoder.up.3.block.0.conv1.weight",
        "fusion_module.fusion_modules.block_1_8.fuse_block.norm1.weight",
        "fusion_module.fusion_modules.block_1_4.scale.0.weight",
    ]
    for k in expected:
        assert k in sd, f"missing torch key {k}"


def test_conv_semantics_match_torch():
    """OIHW->HWIO conversion must make flax Conv compute torch's conv2d."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from dc_vic_tpu.nn.layers import Conv

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 12, 5)).astype(np.float32)
    w_torch = rng.normal(size=(7, 5, 3, 3)).astype(np.float32) * 0.2
    b_torch = rng.normal(size=(7,)).astype(np.float32)

    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_torch), torch.from_numpy(b_torch),
            stride=1, padding=1).numpy().transpose(0, 2, 3, 1)

    m = Conv(7, 3)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(
        w_torch.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b_torch)}}}
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deconv_semantics_match_torch():
    """ConvTranspose2d(k=5, s=2, p=2, op=1) equivalence via t_deconv."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from dc_vic_tpu.models.convert import t_deconv
    from dc_vic_tpu.nn.layers import DeconvTorch

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 6, 4)).astype(np.float32)
    w_torch = rng.normal(size=(4, 9, 5, 5)).astype(np.float32) * 0.1  # (I,O,kH,kW)
    b_torch = rng.normal(size=(9,)).astype(np.float32)

    with torch.no_grad():
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_torch), torch.from_numpy(b_torch),
            stride=2, padding=2, output_padding=1,
        ).numpy().transpose(0, 2, 3, 1)

    m = DeconvTorch(9, 5)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(t_deconv(w_torch)),
                                    "bias": jnp.asarray(b_torch)}}}
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_vqgan_downsample_semantics():
    """VQGAN Downsample uses asymmetric (0,1) padding — must match torch."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from dc_vic_tpu.models.vqgan import Downsample

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 8, 6)).astype(np.float32)
    w = rng.normal(size=(6, 6, 3, 3)).astype(np.float32) * 0.2
    b = rng.normal(size=(6,)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        ref = torch.nn.functional.conv2d(
            xt, torch.from_numpy(w), torch.from_numpy(b), stride=2
        ).numpy().transpose(0, 2, 3, 1)

    m = Downsample()
    params = {"params": {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                                  "bias": jnp.asarray(b)}}}
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_subpixel_deconv_matches_dilated():
    """DeconvTorch's sub-pixel parity decomposition must equal the
    input-dilated reference formulation (same params) to float tolerance."""
    import os

    import jax
    import jax.numpy as jnp
    from dc_vic_tpu.nn.layers import DeconvTorch

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 7, 5, 6), jnp.float32)
    m = DeconvTorch(10, 5)
    params = m.init(jax.random.PRNGKey(8), x)

    dilated = m.apply(params, x)
    os.environ["DCVIC_SUBPIXEL_DECONV"] = "1"
    try:
        sub = m.apply(params, x)
    finally:
        del os.environ["DCVIC_SUBPIXEL_DECONV"]
    assert sub.shape == dilated.shape == (2, 14, 10, 10)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(dilated),
                               atol=1e-5)
