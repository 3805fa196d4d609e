"""Multi-chip serving: the codec's device pipelines run SPMD data-parallel
over a jax.sharding.Mesh (Codec(mesh=...)). Validated on the virtual
8-device CPU mesh: batch-sharded compress/decompress round trips bit-exactly
on the quantized latents, and the decode actually executes sharded (the
image output's batch dim is partitioned across devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.codec.driver import Codec
from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.parallel import make_mesh

# Compile-heavy (subprocess / portable-matrix / mesh) — excluded from the
# dev profile `pytest -m 'not slow'` (VERDICT r4 #9); CI runs everything.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def built():
    spec = build_comp_model(tiny_config())
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    beta = jnp.array([1.0])
    params = jax.jit(
        lambda r, xx: spec.module.init({"params": r}, xx, beta, beta,
                                       is_train=False))(rng, x)
    return spec, params


def _images(B=8, H=64, W=64):
    rng = np.random.default_rng(3)
    base = np.linspace(0, 255, W, dtype=np.float32)[None, None, :, None]
    return np.clip(base + rng.normal(0, 25, (B, H, W, 3)),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["tpu", "compressai"])
def test_mesh_codec_roundtrip(built, fmt):
    spec, params = built
    mesh = make_mesh(8)
    codec = Codec(spec, params, stream_format=fmt, mesh=mesh)
    imgs = _images()
    res = codec.compress(imgs, quality_ind=1, debug=True)
    assert len(res) == 8
    strings = [r["string_list"] for r in res]
    assert codec.verify_roundtrip(res, strings, (64, 64))
    out = codec.decompress(strings)
    assert out.shape == imgs.shape and out.dtype == np.uint8


def test_mesh_codec_decode_is_sharded(built):
    """The reconstruction output must actually be partitioned across the
    mesh (not silently replicated): grab the device buffer before fetch."""
    spec, params = built
    mesh = make_mesh(8)
    codec = Codec(spec, params, stream_format="tpu", mesh=mesh)
    imgs = _images()
    res = codec.compress(imgs, quality_ind=0)
    pending = codec.decompress([r["string_list"] for r in res],
                               defer_fetch=True)
    dev_img = pending._data  # flat [B*padH*padW*3] device buffer
    assert not dev_img.sharding.is_fully_replicated, (
        "mesh decode produced a replicated image buffer — the pipeline "
        "did not actually shard over the mesh")
    assert len(dev_img.sharding.device_set) == 8
    out = pending.fetch()
    assert out.shape == imgs.shape


def test_mesh_codec_nondivisible_batch(built):
    """Any batch size is accepted under a mesh: the driver pads the batch
    to the mesh multiple internally (repeating the last image / stream)
    and drops the pad from every output — compress results, decompress
    images, and verify_roundtrip all see exactly B entries."""
    spec, params = built
    codec = Codec(spec, params, stream_format="tpu", mesh=make_mesh(8))
    imgs = _images(B=6)
    res = codec.compress(imgs, quality_ind=1, debug=True)
    assert len(res) == 6
    strings = [r["string_list"] for r in res]
    assert codec.verify_roundtrip(res, strings, (64, 64))
    out = codec.decompress(strings)
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # deferred fetch drops the pad too
    pending = codec.decompress(strings, defer_fetch=True)
    assert pending.fetch().shape[0] == 6


def test_mesh_codec_matches_pixel_stats(built):
    """Sharded and single-device codecs are different XLA lowerings, so
    their streams may differ at bf16 representation ties — but the decoded
    IMAGES must agree to float-noise tolerance on the same inputs."""
    spec, params = built
    imgs = _images()
    ref = Codec(spec, params, stream_format="tpu")
    mc = Codec(spec, params, stream_format="tpu", mesh=make_mesh(8))
    out_ref = ref.decompress([r["string_list"]
                              for r in ref.compress(imgs, quality_ind=2)])
    out_mesh = mc.decompress([r["string_list"]
                              for r in mc.compress(imgs, quality_ind=2)])
    # uint8 pixels: identical up to quantization flips at rounding boundaries
    frac_diff = np.mean(out_ref.astype(np.int32) != out_mesh.astype(np.int32))
    assert frac_diff < 0.02, f"{frac_diff=}"
    assert np.max(np.abs(out_ref.astype(np.int32)
                         - out_mesh.astype(np.int32))) <= 2


def test_mesh_portable_streams_decode_on_single_device(built):
    """r5 (lifting the r4 portable x mesh exclusion): a portable stream
    encoded on an 8-device mesh must decode BIT-EXACTLY on a plain
    single-device codec, at any batch grouping — the canonical batch-1
    param-chain executables run on mesh device 0, which is the same
    single-device lowering a non-mesh codec compiles."""
    spec, params = built
    mesh = make_mesh(8)
    mcodec = Codec(spec, params, stream_format="tpu", mesh=mesh,
                   portable=True)
    imgs = _images()
    res = mcodec.compress(imgs, quality_ind=1, debug=True)
    strings = [r["string_list"] for r in res]
    # mesh self-check first
    assert mcodec.verify_roundtrip(res, strings, (64, 64))

    scodec = Codec(spec, params, stream_format="tpu", portable=True)
    # per-image decode on one device (the headline portable property)
    for b in range(len(strings)):
        assert scodec.verify_roundtrip([res[b]], [strings[b]], (64, 64)), b
    # and an arbitrary grouping
    assert scodec.verify_roundtrip(res[:3], strings[:3], (64, 64))
    out = scodec.decompress(strings[:3])
    assert out.shape == (3, 64, 64, 3)


def test_single_device_portable_streams_decode_on_mesh(built):
    """The reverse direction: portable streams from a single-device codec
    decode bit-exactly on an 8-device mesh codec."""
    spec, params = built
    scodec = Codec(spec, params, stream_format="tpu", portable=True)
    imgs = _images()
    res = scodec.compress(imgs, quality_ind=1, debug=True)
    strings = [r["string_list"] for r in res]
    mcodec = Codec(spec, params, stream_format="tpu", mesh=make_mesh(8),
                   portable=True)
    assert mcodec.verify_roundtrip(res, strings, (64, 64))
    out = mcodec.decompress(strings)
    assert out.shape == imgs.shape
