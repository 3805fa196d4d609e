"""Portable-stream tests: a Codec(portable=True) writes bitstreams whose
decodability is INDEPENDENT of the encoder's batch configuration — every
float feeding symbolization is derived through canonical batch-1
executables on both sides (driver._encode_param_chain_portable /
_decode_pipeline_portable). The reference gets this property for free by
decoding per image on CPU f32 (ref:
src/models/comp_model/hyperprior_dc_vic_model.py:389-440); the non-portable
fast path instead records its encode batch in the header and the decoder
fails fast on a mismatch (PERF.md section 8b)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_config

from dc_vic_tpu.codec.container import HeaderHandler
from dc_vic_tpu.codec.driver import Codec
from dc_vic_tpu.models import build_comp_model

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


FORMATS = ["tpu-host", "tpu-device", "compressai"]


def make_codec(built, fmt: str, portable: bool) -> Codec:
    spec, params = built
    if fmt == "compressai":
        return Codec(spec, params, stream_format="compressai",
                     portable=portable)
    f, backend = fmt.split("-")
    return Codec(spec, params, stream_format=f, encode_backend=backend,
                 portable=portable)


@pytest.fixture(scope="module", params=FORMATS)
def pcodec(request, built):
    return make_codec(built, request.param, portable=True)


def _images(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32)


def test_portable_header_bit(pcodec):
    res = pcodec.compress(_images(1), quality_ind=1)
    hdr = HeaderHandler.decode(res[0]["string_list"][0])
    assert hdr["portable"] is True


def test_portable_batch16_decodes_individually_and_grouped(pcodec):
    """The VERDICT-r3 acceptance property: encode a batch, then decode
    each .bin individually (B=1) and in a smaller group (B=2) — the
    decoded latents must be bit-exact against the encoder's in every
    grouping, for both stream formats."""
    imgs = _images(4)
    res = pcodec.compress(imgs, quality_ind=0, debug=True)
    sls = [r["string_list"] for r in res]

    # batched decode (the encoder's own grouping)
    assert pcodec.verify_roundtrip(res, sls, (64, 64))
    batched = pcodec.decompress(sls)

    # Per-image decode: LATENTS are the portable guarantee and must be
    # bit-exact (y_hat/z_hat equal the encoder's). The uint8
    # reconstruction runs batched for throughput, and batch-1 vs batch-4
    # recon are different XLA lowerings, so pixels may round differently
    # at representation ties — bounded to the +-1 LSB a tie flip can
    # produce (the reference decodes per image and has no such spread).
    for b in range(4):
        assert pcodec.verify_roundtrip([res[b]], [sls[b]], (64, 64)), \
            f"portable stream {b} failed bit-exact B=1 decode"
        one = pcodec.decompress([sls[b]])
        diff = np.abs(one[0].astype(np.int16) -
                      batched[b].astype(np.int16))
        assert diff.max() <= 1, f"recon grouping spread > 1 LSB: {diff.max()}"

    # group decode at a size the encoder never ran
    assert pcodec.verify_roundtrip(res[1:4], sls[1:4], (64, 64))
    grp = pcodec.decompress(sls[1:4])
    diff = np.abs(grp.astype(np.int16) - batched[1:4].astype(np.int16))
    assert diff.max() <= 1


def test_portable_decodes_on_fresh_codec(built, pcodec):
    """A DIFFERENT Codec instance (fresh jit cache, non-portable
    construction — the header flag drives the decode path) must decode a
    portable stream bit-exactly at B=1."""
    imgs = _images(2, seed=3)
    res = pcodec.compress(imgs, quality_ind=1, debug=True)
    sls = [r["string_list"] for r in res]
    fresh = make_codec(built, "tpu-host"
                       if pcodec.stream_format == "tpu" else "compressai",
                       portable=False)
    assert fresh.verify_roundtrip([res[0]], [sls[0]], (64, 64))
    out = fresh.decompress([sls[1]])
    assert out.shape == (1, 64, 64, 3)


def test_portable_equals_nonportable_at_batch1(built):
    """At B=1 the canonical chain IS the non-portable chain: streams and
    reconstructions must match bitwise."""
    imgs = _images(1, seed=5)
    a = make_codec(built, "tpu-host", portable=True)
    b = make_codec(built, "tpu-host", portable=False)
    ra = a.compress(imgs, quality_ind=0)
    rb = b.compress(imgs, quality_ind=0)
    # identical coded payloads (headers differ in the portable bit)
    assert ra[0]["string_list"][1] == rb[0]["string_list"][1]
    assert ra[0]["string_list"][2] == rb[0]["string_list"][2]
    np.testing.assert_array_equal(a.decompress([ra[0]["string_list"]]),
                                  b.decompress([rb[0]["string_list"]]))


def test_nonportable_batch_mismatch_fails_fast(built):
    """Non-portable tpu streams record their encode batch; decoding at a
    different batch must raise a clear ValueError instead of risking a
    silent lowering-dependent desync."""
    codec = make_codec(built, "tpu-host", portable=False)
    imgs = _images(2, seed=7)
    res = codec.compress(imgs, quality_ind=0)
    sls = [r["string_list"] for r in res]
    hdr = HeaderHandler.decode(sls[0][0])
    assert hdr["portable"] is False and hdr["encode_batch"] == 2
    # same grouping decodes fine
    assert codec.decompress(sls).shape == (2, 64, 64, 3)
    with pytest.raises(ValueError, match="encoded at batch 2"):
        codec.decompress([sls[0]])


def test_portable_mesh_construction(built):
    """r5 lifted the r4 portable x mesh exclusion: a portable mesh codec
    constructs, pins its canonical chain to mesh device 0, and the
    cross-decode directions are pinned in test_codec_mesh."""
    spec, params = built
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:2])
    codec = Codec(spec, params, portable=True,
                  mesh=Mesh(devs, axis_names=("data",)))
    assert codec.portable and codec._canon_dev == jax.devices()[0]
