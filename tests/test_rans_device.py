"""Device-side interleaved rANS: roundtrip, escapes, packing, and rate.

Covers SURVEY hard-part #1 for the tpu stream format the same way
tests/test_rans.py covers the CompressAI-format C coder: exhaustive
self-consistency plus adversarial symbol ranges (|sym| >= 128 exercises the
escape path and the int16-vs-int8 upload concern from round 1).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dc_vic_tpu.ops.cdf import build_cdf_rows
from dc_vic_tpu.ops.rans import CdfTable
from dc_vic_tpu.ops.rans_device import (
    DeviceCdfTable,
    decode_section,
    encode_sections,
    pack_streams,
    section_lanes,
)


def _gaussian_table(scales=(0.5, 1.0, 4.0, 16.0)) -> CdfTable:
    from dc_vic_tpu.codec.gaussian import GaussianConditional
    return GaussianConditional().build_cdf_table(np.asarray(scales))


def _roundtrip(sym, idx, table, n_sections=1):
    """sym/idx [B, N] -> per-image packed bytes -> decoded symbols."""
    B, N = sym.shape
    ns = N // n_sections
    L = section_lanes(ns)
    dt = DeviceCdfTable(table)
    vals, masks = [], []
    for s in range(n_sections):
        sl = slice(s * ns, (s + 1) * ns)
        v, m = encode_sections(
            jnp.asarray(sym[:, sl].reshape(B, -1, L)),
            jnp.asarray(idx[:, sl].reshape(B, -1, L)), dt)
        vals.append(v)
        masks.append(m)
    packed, counts = pack_streams(jnp.concatenate(vals, axis=1),
                                  jnp.concatenate(masks, axis=1))
    counts = np.asarray(counts)
    packed = np.asarray(packed)[: int(counts.sum())]

    # host splits per image (bytes contract), then re-concats for decode —
    # the exact shape of the driver flow
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    strings = [packed[base[b]: base[b] + counts[b]].tobytes()
               for b in range(B)]
    words = np.frombuffer(b"".join(strings), np.uint16)

    cursor = jnp.zeros((B,), jnp.int32)
    out = []
    for s in range(n_sections):
        sl = slice(s * ns, (s + 1) * ns)
        dec, cursor, x_fin = decode_section(
            jnp.asarray(words), jnp.asarray(base), cursor, None,
            jnp.asarray(idx[:, sl].reshape(B, -1, L)), dt)
        out.append(np.asarray(dec).reshape(B, -1))
        # all lanes must drain to the initial encoder state
        assert np.all(np.asarray(x_fin) == 1 << 16)
    assert np.array_equal(np.asarray(cursor), counts)
    return np.concatenate(out, axis=1), sum(len(s) for s in strings)


def test_roundtrip_inrange():
    table = _gaussian_table()
    rng = np.random.default_rng(0)
    B, N = 3, 512
    idx = rng.integers(0, 4, (B, N), np.int32)
    scale = np.asarray([0.5, 1.0, 4.0, 16.0])[idx]
    sym = np.round(rng.normal(0, scale)).astype(np.int32)
    dec, _ = _roundtrip(sym, idx, table)
    assert np.array_equal(dec, sym)


def test_roundtrip_escapes_and_large_symbols():
    table = _gaussian_table()
    rng = np.random.default_rng(1)
    B, N = 2, 256
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = rng.integers(-5, 6, (B, N)).astype(np.int32)
    # far outside every row's support: |sym| >= 128 up to +-20000
    hot = rng.random((B, N)) < 0.15
    sym = np.where(hot, rng.integers(-20000, 20000, (B, N)), sym)
    sym = sym.astype(np.int32)
    sym[0, 0] = 19999
    sym[0, 1] = -19999
    sym[0, 2] = 128
    sym[0, 3] = -128
    dec, _ = _roundtrip(sym, idx, table)
    assert np.array_equal(dec, sym)


def test_roundtrip_multi_section_cursor_carry():
    """Consecutive sections of one stream (the ChARM slice layout) share the
    per-image cursor."""
    table = _gaussian_table()
    rng = np.random.default_rng(2)
    B, N = 2, 384
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = np.round(rng.normal(0, 2.0, (B, N))).astype(np.int32)
    dec, _ = _roundtrip(sym, idx, table, n_sections=3)
    assert np.array_equal(dec, sym)


def test_rate_close_to_host_coder():
    """Same CDF rows => coded size within flush overhead of the C coder."""
    from dc_vic_tpu.ops.rans import encode_with_indexes
    table = _gaussian_table()
    rng = np.random.default_rng(3)
    B, N = 2, 4096
    idx = rng.integers(0, 4, (B, N), np.int32)
    scale = np.asarray([0.5, 1.0, 4.0, 16.0])[idx]
    sym = np.round(rng.normal(0, scale)).astype(np.int32)
    _, tpu_bytes = _roundtrip(sym, idx, table)
    host_bytes = sum(
        len(encode_with_indexes(sym[b].reshape(-1), idx[b].reshape(-1),
                                table)) for b in range(B))
    L = section_lanes(N)
    overhead = B * 4 * L
    assert tpu_bytes <= host_bytes + overhead + 64
    assert tpu_bytes >= host_bytes - 64  # same probabilities, no free lunch


def test_lane_divisibility():
    assert section_lanes(49152) == 128   # Kodak ChARM slice
    assert section_lanes(18432) == 128   # Kodak z plane
    assert section_lanes(192) == 8       # tiny sections get few lanes
    for n in (6, 50, 100, 352, 512):
        L = section_lanes(n)
        assert n % L == 0 and 1 <= L <= 128 and (L == 1 or n // L >= 16)


def test_entropy_bottleneck_table_roundtrip():
    """z-style table: one row per channel, via the factorized bottleneck."""
    import jax

    from dc_vic_tpu.codec.bottleneck import (
        EntropyBottleneck, build_bottleneck_cdf)
    eb = EntropyBottleneck(8)
    params = jax.jit(lambda r, x: eb.init(r, x, is_train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    table = build_bottleneck_cdf(eb, params)
    rng = np.random.default_rng(4)
    B, N = 2, 640
    idx = np.broadcast_to(np.arange(8, dtype=np.int32), (B, N // 8, 8)
                          ).reshape(B, N).copy()
    sym = rng.integers(-30, 30, (B, N)).astype(np.int32)
    dec, _ = _roundtrip(sym, idx, table)
    assert np.array_equal(dec, sym)


def test_c_host_coder_matches_device_coder():
    """The C host-side coder for the tpu format must produce byte-identical
    streams to the jnp device coder (the codec pipeline encodes on the host
    and decodes on the device), and each must invert the other."""
    from dc_vic_tpu.ops.rans import tpu_decode_section, tpu_encode_sections
    table = _gaussian_table()
    dt = DeviceCdfTable(table)
    rng = np.random.default_rng(9)
    n_secs, n, L = 3, 48, 16
    secs = []
    for s in range(n_secs):
        idx = rng.integers(0, 4, (n, L)).astype(np.int32)
        sym = np.round(rng.normal(0, 3.0, (n, L))).astype(np.int32)
        hot = rng.random((n, L)) < 0.2
        sym = np.where(hot, rng.integers(-30000, 30000, (n, L)), sym)
        secs.append((sym.astype(np.int32), idx))

    # device encode (B=1), sections concatenated
    vals, masks = [], []
    for sym, idx in secs:
        v, m = encode_sections(jnp.asarray(sym[None]), jnp.asarray(idx[None]),
                               dt)
        vals.append(v)
        masks.append(m)
    packed, counts = pack_streams(jnp.concatenate(vals, axis=1),
                                  jnp.concatenate(masks, axis=1))
    dev_bytes = np.asarray(packed)[: int(np.asarray(counts)[0])].tobytes()

    host_bytes = tpu_encode_sections(secs, table)
    assert host_bytes == dev_bytes, (
        f"host C coder diverges from device coder "
        f"({len(host_bytes)} vs {len(dev_bytes)} bytes)")

    # C decode inverts, section by section with a carried cursor
    words = np.frombuffer(host_bytes, np.uint16)
    off = 0
    for sym, idx in secs:
        dec, off = tpu_decode_section(words, off, idx, table)
        np.testing.assert_array_equal(dec, sym)
    assert off == len(words)

    # device decode inverts the host bytes too
    cursor = jnp.zeros((1,), jnp.int32)
    base = jnp.zeros((1,), jnp.int32)
    for sym, idx in secs:
        dec, cursor, _ = decode_section(jnp.asarray(words), base, cursor,
                                        None, jnp.asarray(idx[None]), dt)
        np.testing.assert_array_equal(np.asarray(dec)[0], sym)
