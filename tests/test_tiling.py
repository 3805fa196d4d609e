"""Spatial tiling tests: tile/stitch inverses and the >1024px codec path."""
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.codec.tiling import (
    extract_tiles,
    keep_region,
    stitch_tiles,
    tile_starts,
)


def test_tile_starts():
    assert tile_starts(512, 512, 256) == [0]
    assert tile_starts(1024, 512, 256) == [0, 256, 512]
    assert tile_starts(1280, 512, 256) == [0, 256, 512, 768]
    # final window is flush with the end
    assert tile_starts(1100, 512, 256)[-1] == 1100 - 512


def test_keep_regions_cover_exactly():
    """Overlap-discard regions must partition the full extent."""
    for full in (1024, 1100, 1536, 2048):
        starts = tile_starts(full, 512, 256)
        regions = [keep_region(starts, i, 512, 256, full)
                   for i in range(len(starts))]
        assert regions[0][0] == 0
        assert regions[-1][1] == full
        for (a_lo, a_hi), (b_lo, b_hi) in zip(regions, regions[1:]):
            assert a_hi == b_lo  # contiguous, no gaps or overlap


def test_extract_stitch_identity():
    """Stitching an identity transform of the tiles reproduces the input."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 160, 288, 5)).astype(np.float32)
    tiles, tops, lefts = extract_tiles(x, 64, 32)
    out = stitch_tiles(tiles, x.shape, tops, lefts, 64, 32)
    np.testing.assert_array_equal(out, x)


def test_extract_stitch_identity_scaled():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 24, 40, 3)).astype(np.float32)  # y-space
    tiles, tops, lefts = extract_tiles(x, 8, 4)
    # pretend each tile decodes to 16x resolution
    up = np.repeat(np.repeat(tiles, 16, axis=1), 16, axis=2)
    out = stitch_tiles(up, (1, 24 * 16, 40 * 16, 3), tops, lefts, 8, 4,
                       scale=16)
    ref = np.repeat(np.repeat(x, 16, axis=1), 16, axis=2)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["tpu", "compressai"])
def test_large_image_codec_roundtrip(fmt):
    """>1024px image goes through split VQ-encode and split reconstruction
    and still round-trips the latents bit-exactly (both stream formats)."""
    import jax
    import jax.numpy as jnp

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model

    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, x0, beta, beta, is_train=False))(rng)
    codec = Codec(spec, params, stream_format=fmt)

    img = np.random.default_rng(2).uniform(
        -1, 1, (1, 1152, 640, 3)).astype(np.float32)
    res = codec.compress(img, quality_ind=0, debug=True)
    out = codec.decompress([res[0]["string_list"]])
    assert out.shape == img.shape
    assert out.dtype == np.uint8

    # decode-side latents must match the encoder bit-exactly
    assert codec.verify_roundtrip(res, [res[0]["string_list"]], (1152, 640))


@pytest.mark.slow
def test_large_image_uint8_matches_f32():
    """uint8 input through the >1024px split-encode path must produce the
    same bitstream as host-normalized f32 input (device-side normalization
    runs inside vq_encode_tile for the tiled path)."""
    import jax
    import jax.numpy as jnp

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model

    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, x0, beta, beta, is_train=False))(rng)
    codec = Codec(spec, params)

    img_u8 = np.random.default_rng(5).integers(
        0, 256, (1, 1152, 640, 3), dtype=np.uint8)
    img_f32 = ((img_u8.astype(np.float32) / 255.0) - 0.5) / 0.5
    res_u8 = codec.compress(img_u8, quality_ind=0)[0]
    res_f32 = codec.compress(img_f32, quality_ind=0)[0]
    assert res_u8["string_list"] == res_f32["string_list"]
