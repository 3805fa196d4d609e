"""End-to-end codec tests: the compress->bits->decompress round trip must be
bit-exact on the quantized latents (the reference's commented-out allclose
check at scripts/compress.py:137-138, made real and strict)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config

from dc_vic_tpu.codec.container import (
    HeaderHandler,
    load_byte_strings,
    save_byte_strings,
)
from dc_vic_tpu.codec.driver import Codec
from dc_vic_tpu.models import build_comp_model


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


@pytest.fixture(scope="module",
                params=["tpu-host", "tpu-device", "compressai"])
def codec(request, built):
    spec, params = built
    if request.param == "compressai":
        return Codec(spec, params, stream_format="compressai")
    fmt, backend = request.param.split("-")
    return Codec(spec, params, stream_format=fmt, encode_backend=backend)


def test_header_roundtrip():
    for fmt in (False, True):
        for portable in (False, True):
            for t2free, esc_dense in ((False, False), (True, False),
                                      (False, True), (True, True)):
                h = HeaderHandler.encode((768, 512), 17, 3, tpu_format=fmt,
                                         lanes=512, portable=portable,
                                         esc_dense=esc_dense, t2free=t2free,
                                         encode_batch=16, fast_entropy=fmt,
                                         bf16=True)
                # compressai headers keep the reference's 6-byte layout; tpu
                # headers append a uint16 encode-batch field + a numeric-
                # config byte (entropy_precision / codec_dtype)
                assert len(h) == (9 if fmt else 6)
                d = HeaderHandler.decode(h)
                assert d["img_size"] == (768, 512)
                assert d["quality_ind"] == 3
                assert d["portable"] is portable
                assert d["stream_format"] == ("tpu" if fmt else "compressai")
                if fmt:
                    assert d["lanes"] == 512 and d["max_sample"] is None
                    assert d["encode_batch"] == 16
                    assert d["esc_dense"] is esc_dense
                    assert d["t2free"] is t2free
                    assert d["fast_entropy"] is True and d["bf16"] is True
                else:
                    assert d["max_sample"] == 17 and d["lanes"] is None
                    assert d["encode_batch"] is None
                    assert d["t2free"] is None
                    assert d["fast_entropy"] is None and d["bf16"] is None


def test_header_legacy_6byte_tpu():
    """Round-<=3 tpu headers were 6 bytes (no encode-batch record, no
    portable bit): they must still parse, with encode_batch None so the
    batch-coupling check is skipped."""
    import struct
    legacy = struct.pack("<HHBB", 768, 512, 9, 0x80 | 2)
    d = HeaderHandler.decode(legacy)
    assert d["stream_format"] == "tpu"
    assert d["lanes"] == 512 and d["quality_ind"] == 2
    assert d["portable"] is False and d["encode_batch"] is None
    # legacy streams carry no tier-2-free guarantee: decode conservatively
    assert d["t2free"] is False


def test_header_quality_range():
    with pytest.raises(ValueError):
        HeaderHandler.encode((8, 8), 0, 64)


def test_container_roundtrip(tmp_path):
    strings = [b"abc", b"", b"\x00\x01\x02" * 100]
    p = str(tmp_path / "x.bin")
    save_byte_strings(p, strings)
    assert load_byte_strings(p) == strings


def test_compress_decompress_bit_exact(codec):
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    res = codec.compress(img, quality_ind=1)
    assert len(res) == 2
    for r in res:
        assert len(r["string_list"]) == 3
        assert len(r["string_list"][1]) > 0
        assert len(r["string_list"][2]) > 0

    out = codec.decompress([r["string_list"] for r in res])
    assert out.shape == img.shape
    assert out.dtype == np.uint8


def test_tpu_streams_carry_t2free_guarantee(codec):
    """Production tpu streams (clipped symbolizers) must certify themselves
    tier-2-free so the decoder's fast escape epilogue engages — and the
    roundtrip through that fast path must stay bit-exact (the decompress in
    test_compress_decompress_bit_exact already runs it; this pins the flag
    itself so a silently-cleared bit can't regress the fast path to the
    conservative one without failing)."""
    if codec.stream_format != "tpu":
        pytest.skip("t2free is a tpu-format header bit")
    rng = np.random.default_rng(6)
    img = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    res = codec.compress(img, quality_ind=1, debug=True)
    for r in res:
        assert HeaderHandler.decode(r["string_list"][0])["t2free"] is True
    assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                  (64, 64))


def test_decoded_y_hat_matches_encoder(codec):
    """The decoder-side reconstruction of y_hat must equal the encoder's
    y_hat bit-exactly — otherwise mu/sigma drift would corrupt the stream."""
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    res = codec.compress(img, quality_ind=0, debug=True)
    assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                  (64, 64))

    if codec.stream_format != "compressai":
        return
    # additionally exercise the host-decode internals piecewise
    H, W = img.shape[1], img.shape[2]
    z_strs = [res[0]["string_list"][1]]
    y_strs = [res[0]["string_list"][2]]

    padH = -(-H // codec.model_stride) * codec.model_stride
    padW = -(-W // codec.model_stride) * codec.model_stride
    zH, zW = padH // codec.model_stride, padW // codec.model_stride
    yH, yW = padH // codec.y_stride, padW // codec.y_stride
    Cz, Cy = codec.module.bottleneck_z, codec.module.bottleneck_y

    from dc_vic_tpu.ops.rans import decode_with_indexes
    z_idx1 = np.broadcast_to(np.arange(Cz, dtype=np.int32),
                             (zH, zW, Cz)).reshape(-1)
    z_sym = decode_with_indexes(z_strs[0], z_idx1, codec.z_table)
    z_sym = z_sym.reshape(1, zH, zW, Cz)
    hyper_out, z_hat = codec._get_jit(("hyper", z_sym.shape),
                                      codec._hyper_decode_fn)(
        codec.params, jnp.asarray(z_sym))
    np.testing.assert_array_equal(np.asarray(z_hat)[0], res[0]["z_hat"])

    y_hat = codec._charm_decode(hyper_out, y_strs, 1, yH, yW, Cy)
    np.testing.assert_array_equal(np.asarray(y_hat)[0], res[0]["y_hat"])


def test_cross_format_parity(built):
    """Both stream formats must produce identical reconstructions, and each
    codec must auto-detect and decode the other's streams."""
    spec, params = built
    c_tpu = Codec(spec, params, stream_format="tpu")
    c_cai = Codec(spec, params, stream_format="compressai")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (2, 96, 80, 3), dtype=np.uint8)

    res_t = c_tpu.compress(img, quality_ind=1, debug=True)
    res_c = c_cai.compress(img, quality_ind=1, debug=True)
    for rt, rc in zip(res_t, res_c):
        np.testing.assert_array_equal(rt["y_hat"], rc["y_hat"])
        np.testing.assert_array_equal(rt["z_hat"], rc["z_hat"])

    out_t = c_tpu.decompress([r["string_list"] for r in res_t])
    out_c = c_cai.decompress([r["string_list"] for r in res_c])
    np.testing.assert_array_equal(out_t, out_c)
    # format auto-detect: the compressai codec decodes tpu streams
    out_x = c_cai.decompress([r["string_list"] for r in res_t])
    np.testing.assert_array_equal(out_x, out_t)


def test_bpp_estimate_matches_actual(codec):
    """Actual coded bits should be within ~8% of the likelihood estimate
    (plus, for the tpu format, the known per-lane flush overhead)."""
    from dc_vic_tpu.ops.rans_device import section_lanes
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    res = codec.compress(img, quality_ind=2)[0]
    actual_bits = 8 * (len(res["string_list"][1]) + len(res["string_list"][2]))
    pred_bits = (res["pred_y_bpp"] + res["pred_z_bpp"]) * res["num_pixel"]
    slack = 256
    if codec.stream_format == "tpu":
        yH = yW = 128 // codec.y_stride
        zH = zW = 128 // codec.model_stride
        Cy, Cz = codec.module.bottleneck_y, codec.module.bottleneck_z
        lanes = sum(section_lanes(yH * yW * (hi - lo))
                    for lo, hi in codec._tpu_y_sections(Cy))
        lanes += section_lanes(zH * zW * Cz)
        slack += 32 * lanes  # 4 flush bytes per lane
    assert actual_bits < pred_bits * 1.08 + slack, (actual_bits, pred_bits)


def test_uint8_input_matches_host_normalized(codec):
    """uint8 pixels fed straight to the codec (device-side normalize) must
    produce byte-identical bitstreams to host-normalized f32 input — the
    device conversion mirrors the reference transform's f32 op order
    (ref: src/dataset/data_transform.py ToTensor+Normalize(.5,.5))."""
    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    img_f32 = ((img_u8.astype(np.float32) / 255.0) - 0.5) / 0.5

    res_u8 = codec.compress(img_u8, quality_ind=1)
    res_f32 = codec.compress(img_f32, quality_ind=1)
    for a, b in zip(res_u8, res_f32):
        assert a["string_list"] == b["string_list"]

    out = codec.decompress([r["string_list"] for r in res_u8])
    assert out.shape == img_u8.shape and out.dtype == np.uint8


def test_packed_symbol_plane_unpack():
    """The uint16 (idx<<10 | sym+512) packing used for the d2h symbol plane
    must invert exactly over the full sym x idx range."""
    sym = np.arange(-512, 512, dtype=np.int32)
    idx = np.tile(np.arange(64, dtype=np.int32), 16)
    packed = ((idx.astype(np.uint16) << 10)
              | (sym + 512).astype(np.uint16))
    np.testing.assert_array_equal((packed & 1023).astype(np.int32) - 512, sym)
    np.testing.assert_array_equal((packed >> 10).astype(np.int32), idx)


def test_lane_cap_roundtrip(built):
    """A high-lane-cap (throughput-mode) stream decodes correctly on any
    codec — the cap travels in the header."""
    spec, params = built
    c512 = Codec(spec, params, stream_format="tpu", lanes=512)
    c128 = Codec(spec, params, stream_format="tpu", lanes=128)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (1, 96, 80, 3), dtype=np.uint8)
    res = c512.compress(img, quality_ind=1)
    out_a = c512.decompress([res[0]["string_list"]])
    out_b = c128.decompress([res[0]["string_list"]])  # header carries lanes
    np.testing.assert_array_equal(out_a, out_b)
    res_128 = c128.compress(img, quality_ind=1)
    np.testing.assert_array_equal(
        c512.decompress([res_128[0]["string_list"]]), out_a)


def test_codec_dtype_bf16_roundtrip():
    """codec_dtype=bfloat16 runs the conv stacks in bf16 but keeps the
    entropy path f32: streams still roundtrip bit-exactly on the latents."""
    from helpers import tiny_config
    cfg = tiny_config()
    cfg["codec_dtype"] = "bfloat16"
    spec = build_comp_model(cfg)
    rng = jax.random.PRNGKey(0)
    beta = jnp.array([1.0])
    params = jax.jit(
        lambda r, xx: spec.module.init({"params": r}, xx, beta, beta,
                                       is_train=False))(
        rng, jnp.zeros((1, 64, 64, 3)))
    # params stay f32 (param_dtype default) — checkpoint compatibility
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(params)
               if a.dtype.kind == "f")
    codec = Codec(spec, params)
    img = np.random.default_rng(5).integers(0, 256, (2, 96, 80, 3), np.uint8)
    res = codec.compress(img, quality_ind=1, debug=True)
    out = codec.decompress([r["string_list"] for r in res])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                  (96, 80))


def test_entropy_precision_default_roundtrip():
    """entropy_precision="default" (single-pass bf16 entropy-parameter
    convs — the fast TPU deployment mode) must still roundtrip bit-exactly:
    encode and decode derive mu/sigma from the same lowered executables, so
    the coarser multiplies are consistent on both sides. Also pins that the
    setting actually changes the model (different streams vs "high"), so a
    silently-ignored config key can't fake this test out."""
    from helpers import tiny_config
    cfg = tiny_config()
    cfg["codec_dtype"] = "bfloat16"
    rng = jax.random.PRNGKey(0)
    beta = jnp.array([1.0])
    img = np.random.default_rng(5).integers(0, 256, (2, 96, 80, 3), np.uint8)
    streams = {}
    for pr in ("high", "default"):
        cfg["entropy_precision"] = pr
        spec = build_comp_model(cfg)
        params = jax.jit(
            lambda r, xx: spec.module.init({"params": r}, xx, beta, beta,
                                           is_train=False))(
            rng, jnp.zeros((1, 64, 64, 3)))
        codec = Codec(spec, params, stream_format="tpu",
                      encode_backend="device")
        res = codec.compress(img, quality_ind=1, debug=True)
        assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                      (96, 80))
        streams[pr] = [bytes(s) for r in res for s in r["string_list"]]
    # On CPU both precisions lower to the same f32 dot, so equal streams are
    # expected there; on TPU the bf16 single-pass mode must differ.
    if jax.default_backend() == "tpu":
        assert streams["high"] != streams["default"]


def test_entropy_precision_mismatch_fails_fast():
    """tpu-format headers record the stream-defining numeric config
    (entropy_precision / codec_dtype, ADVICE r4): a decoder built with the
    other setting must raise instead of silently desyncing."""
    from helpers import tiny_config
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    beta = jnp.array([1.0])
    img = np.random.default_rng(6).integers(0, 256, (1, 64, 64, 3), np.uint8)
    codecs = {}
    for pr in ("high", "default"):
        cfg["entropy_precision"] = pr
        spec = build_comp_model(cfg)
        params = jax.jit(
            lambda r, xx: spec.module.init({"params": r}, xx, beta, beta,
                                           is_train=False))(
            rng, jnp.zeros((1, 64, 64, 3)))
        codecs[pr] = Codec(spec, params, stream_format="tpu",
                           encode_backend="device")
    res = codecs["default"].compress(img, quality_ind=0)
    with pytest.raises(ValueError, match="entropy_precision"):
        codecs["high"].decompress([res[0]["string_list"]])
    # the matching codec decodes fine
    out = codecs["default"].decompress([res[0]["string_list"]])
    assert out.shape == (1, 64, 64, 3)


def test_invalid_numeric_knobs_rejected_at_build():
    """A typo'd entropy_precision/codec_dtype YAML value fails at
    build_comp_model with a readable error, not at first trace (ADVICE
    r4)."""
    from helpers import tiny_config
    cfg = tiny_config()
    cfg["entropy_precision"] = "hgih"
    with pytest.raises(ValueError, match="entropy_precision"):
        build_comp_model(cfg)
    cfg2 = tiny_config()
    cfg2["codec_dtype"] = "bf16"  # must be spelled "bfloat16"
    with pytest.raises(ValueError, match="codec_dtype"):
        build_comp_model(cfg2)


def test_escfree_certification_consistent(codec):
    """r5 speculative pack: the header's escape-free certification must be
    CONSISTENT with the stream content — a certified stream decodes through
    the epilogue-free fast path bit-exactly (verify_roundtrip reads the
    header bit), an uncertified one falls back through the clipped pack
    and still roundtrips. Whether a given stream certifies depends on the
    model's mu/sigma fit (the tiny PRNG model produces escapes; the bench
    flagship at the contract workload measures zero — certification is
    exercised on-chip either way); the escfree coder paths themselves are
    pinned in tests/test_rans_device.py."""
    if codec.stream_format != "tpu":
        pytest.skip("escfree is a tpu-format certification")
    rng = np.random.default_rng(17)
    seen = set()
    for amp, B in ((0.2, 2), (50.0, 1)):
        img = (rng.uniform(-1, 1, (B, 64, 64, 3)) * amp).astype(np.float32)
        res = codec.compress(img, quality_ind=0, debug=True)
        hdrs = [HeaderHandler.decode(r["string_list"][0]) for r in res]
        assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                      (64, 64))
        out = codec.decompress([r["string_list"] for r in res])
        assert out.shape == (B, 64, 64, 3)
        seen.update(bool(h["escfree"]) for h in hdrs)
    # the driver must have produced valid headers either way
    assert seen <= {True, False} and seen


def test_pathological_symbols_clip_consistently(codec):
    """Inputs that drive |symbol| beyond the int16 transport clip must still
    roundtrip: y_hat is derived from the CLIPPED coded symbols everywhere
    (regression: big+bf16 on-chip selfcheck failure, round 2)."""
    rng = np.random.default_rng(13)
    img = (rng.uniform(-1, 1, (1, 64, 64, 3)) * 1e4).astype(np.float32)
    res = codec.compress(img, quality_ind=0, debug=True)
    assert codec.verify_roundtrip(res, [r["string_list"] for r in res],
                                  (64, 64))


def test_bench_device_cycle_api(built):
    """bench.py's link-weather-immune decomposition helper: runs the pure
    device graphs and returns positive per-batch times (the driver's
    recorded JSON depends on this API staying alive)."""
    spec, params = built
    c = Codec(spec, params, stream_format="tpu")
    imgs = np.random.default_rng(7).integers(
        0, 256, (2, 96, 80, 3), dtype=np.uint8)
    out = c.bench_device_cycle(imgs, beta_rate=1.0, beta_vq=1.0, iters=1)
    assert out["enc_s"] > 0 and out["dec_s"] > 0


def test_build_indexes_matches_searchsorted():
    """The gather-free compare-reduce build_indexes must agree with
    jnp.searchsorted(side='left') — i.e. with compressai's per-entry
    subtraction — everywhere, including exact table-boundary scales (a
    wrong index silently desynchronizes encoder and decoder)."""
    from dc_vic_tpu.codec.gaussian import GaussianConditional, get_scale_table
    g = GaussianConditional()
    table = np.asarray(get_scale_table(), np.float32)
    rng = np.random.default_rng(0)
    scales = np.concatenate([
        table,                              # exact boundaries
        np.nextafter(table, -np.inf),       # just below each entry
        np.nextafter(table, np.inf),        # just above each entry
        rng.uniform(0.0, 300.0, 4096).astype(np.float32),
        [0.0, 1e-9, float(g.scale_bound), 1e9],
    ]).astype(np.float32)
    got = np.asarray(g.build_indexes(jnp.asarray(scales), table))
    bounded = np.maximum(scales, np.float32(g.scale_bound))
    want = np.searchsorted(table[:-1], bounded, side="left")
    np.testing.assert_array_equal(got, want)


def test_params_backend_api(built):
    """r5: the compressai format defaults its entropy-parameter chain to
    the CPU platform (the reference's codec placement — the basis of the
    measured TPU-encode -> CPU-decode bit-exactness,
    docs/artifacts/cross_platform_r5.json); the tpu format keeps it on the
    accelerator and rejects the cpu override. On the CPU-only CI both
    chains are the same platform — the cross-platform property itself is
    proven on chip by scripts/cross_platform_check.py."""
    spec, params = built
    c = Codec(spec, params, stream_format="compressai")
    assert c.params_backend == "cpu"
    c2 = Codec(spec, params, stream_format="compressai",
               params_backend="accel")
    assert c2.params_backend == "accel"
    assert Codec(spec, params, stream_format="tpu").params_backend == "accel"
    with pytest.raises(AssertionError):
        Codec(spec, params, stream_format="tpu", params_backend="cpu")
    # the default-cpu codec roundtrips
    img = np.random.default_rng(9).integers(0, 256, (1, 64, 64, 3), np.uint8)
    res = c.compress(img, quality_ind=0, debug=True)
    assert c.verify_roundtrip(res, [r["string_list"] for r in res], (64, 64))


def test_header_legacy_8byte_r4_tpu():
    """Round-4 tpu headers were 8 bytes (no numeric-config byte): they must
    parse with fast_entropy/bf16/escfree unknown, so the decoder skips the
    config check and decodes through the conservative (non-escfree)
    epilogue."""
    import struct
    legacy = struct.pack("<HHBB", 768, 512, 9 | 0x40, 0x80 | 1)
    legacy += struct.pack("<H", 16)
    d = HeaderHandler.decode(legacy)
    assert d["stream_format"] == "tpu" and d["encode_batch"] == 16
    assert d["t2free"] is True  # r4 bit 6 of the lane byte
    assert d["fast_entropy"] is None and d["bf16"] is None
    assert d["escfree"] is None
