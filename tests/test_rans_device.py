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
    ESC_POISON,
    DeviceCdfTable,
    decode_section,
    encode_sections,
    encode_stream,
    esc_cap,
    pack_streams,
    section_lanes,
)


def _gaussian_table(scales=(0.5, 1.0, 4.0, 16.0)) -> CdfTable:
    from dc_vic_tpu.codec.gaussian import GaussianConditional
    return GaussianConditional().build_cdf_table(np.asarray(scales))


def _roundtrip(sym, idx, table, n_sections=1, lane_cap=None):
    """sym/idx [B, N] -> per-image packed bytes -> decoded symbols.
    Multi-section streams use the chained format (one flush per stream),
    exactly like the driver flow."""
    B, N = sym.shape
    ns = N // n_sections
    L = section_lanes(ns, *(() if lane_cap is None else (lane_cap,)))
    dt = DeviceCdfTable(table)
    sections = [(jnp.asarray(sym[:, s * ns:(s + 1) * ns].reshape(B, -1, L)),
                 jnp.asarray(idx[:, s * ns:(s + 1) * ns].reshape(B, -1, L)))
                for s in range(n_sections)]
    vals, mask = encode_stream(sections, dt)
    packed, counts = pack_streams(vals, mask)
    counts = np.asarray(counts)
    packed = np.asarray(packed)[: int(counts.sum())]

    # host splits per image (bytes contract), then re-concats for decode —
    # the exact shape of the driver flow
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    strings = [packed[base[b]: base[b] + counts[b]].tobytes()
               for b in range(B)]
    words = np.frombuffer(b"".join(strings), np.uint16)

    cursor = jnp.zeros((B,), jnp.int32)
    state = None
    out = []
    for s in range(n_sections):
        sl = slice(s * ns, (s + 1) * ns)
        dec, cursor, state = decode_section(
            jnp.asarray(words), jnp.asarray(base), cursor, state,
            jnp.asarray(idx[:, sl].reshape(B, -1, L)), dt)
        out.append(np.asarray(dec).reshape(B, -1))
    # after the LAST section all lanes drain to the initial encoder state
    assert np.all(np.asarray(state) == 1 << 16)
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
    and decodes on the device), and each must invert the other — including
    the chained lane states across sections."""
    from dc_vic_tpu.ops.rans import tpu_decode_stream, tpu_encode_sections
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

    # device encode (B=1), chained stream
    vals, mask = encode_stream(
        [(jnp.asarray(sym[None]), jnp.asarray(idx[None]))
         for sym, idx in secs], dt)
    packed, counts = pack_streams(vals, mask)
    dev_bytes = np.asarray(packed)[: int(np.asarray(counts)[0])].tobytes()

    host_bytes = tpu_encode_sections(secs, table)
    assert host_bytes == dev_bytes, (
        f"host C coder diverges from device coder "
        f"({len(host_bytes)} vs {len(dev_bytes)} bytes)")

    # C stream decode inverts
    words = np.frombuffer(host_bytes, np.uint16)
    dec_secs, used = tpu_decode_stream(words, [idx for _, idx in secs], table)
    for (sym, _), dec in zip(secs, dec_secs):
        np.testing.assert_array_equal(dec, sym)
    assert used == len(words)

    # device decode inverts the host bytes too (state threaded)
    cursor = jnp.zeros((1,), jnp.int32)
    base = jnp.zeros((1,), jnp.int32)
    state = None
    for sym, idx in secs:
        dec, cursor, state = decode_section(jnp.asarray(words), base, cursor,
                                            state, jnp.asarray(idx[None]), dt)
        np.testing.assert_array_equal(np.asarray(dec)[0], sym)


def _encode_for_decode(sym, idx, table, n_sections=1):
    """Encode sym/idx [B, N] into (words, base, L, counts)."""
    B, N = sym.shape
    ns = N // n_sections
    L = section_lanes(ns)
    dt = DeviceCdfTable(table)
    sections = [(jnp.asarray(sym[:, s * ns:(s + 1) * ns].reshape(B, -1, L)),
                 jnp.asarray(idx[:, s * ns:(s + 1) * ns].reshape(B, -1, L)))
                for s in range(n_sections)]
    vals, mask = encode_stream(sections, dt)
    packed, counts = pack_streams(vals, mask)
    counts = np.asarray(counts)
    words = np.asarray(packed)[: int(counts.sum())]
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    return dt, jnp.asarray(words), jnp.asarray(base), L, counts


def test_sparse_escape_epilogue_matches_dense():
    """The capped escape epilogue must decode bit-exactly whenever every
    section's escape count is within esc_cap — including multi-section
    chained streams, tier-2 (32-bit) escapes, and images with zero
    escapes."""
    table = _gaussian_table()
    rng = np.random.default_rng(11)
    B, N, n_sections = 3, 6144, 2
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = np.round(rng.normal(0, 1.5, (B, N))).astype(np.int32)
    # image 0: no escapes; image 1: sparse small escapes; image 2: sparse
    # escapes incl. tier-2 raws
    hot1 = rng.random(N) < 0.01
    sym[1, hot1] = rng.integers(-200, 200, hot1.sum())
    hot2 = rng.random(N) < 0.02
    sym[2, hot2] = rng.integers(-30000, 30000, hot2.sum())
    dt, words, base, L, counts = _encode_for_decode(sym, idx, table,
                                                    n_sections)
    ns = N // n_sections
    cursor = jnp.zeros((B,), jnp.int32)
    state = None
    out = []
    for s in range(n_sections):
        sl = slice(s * ns, (s + 1) * ns)
        dec, cursor, state = decode_section(
            words, base, cursor, state,
            jnp.asarray(idx[:, sl].reshape(B, -1, L)), dt, sparse_esc=True)
        out.append(np.asarray(dec).reshape(B, -1))
    assert np.array_equal(np.concatenate(out, axis=1), sym)
    assert np.array_equal(np.asarray(cursor), counts)


def test_sparse_escape_overflow_poisons_cursor():
    """More escapes than esc_cap must poison the cursor (the driver's
    consumed-words check turns that into a loud error) instead of silently
    decoding garbage."""
    table = _gaussian_table()
    rng = np.random.default_rng(12)
    B, N = 2, 2048
    cap = esc_cap(N)
    assert cap < N, "test geometry must leave room for overflow"
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = np.round(rng.normal(0, 1.5, (B, N))).astype(np.int32)
    sym[1, :] = rng.integers(-3000, 3000, N)  # image 1: ~all escapes
    dt, words, base, L, counts = _encode_for_decode(sym, idx, table)
    dec, cursor, _ = decode_section(
        words, base, jnp.zeros((B,), jnp.int32), None,
        jnp.asarray(idx.reshape(B, -1, L)), dt, sparse_esc=True)
    cur = np.asarray(cursor)
    assert cur[1] >= ESC_POISON, "overflowing image must be poisoned"
    assert cur[0] == counts[0], "clean image must decode exactly"
    assert np.array_equal(np.asarray(dec)[0].reshape(-1), sym[0])


def test_esc_cap_static_properties():
    for n in (64, 1024, 8192, 49152, 1 << 20):
        cap = esc_cap(n)
        assert 1 <= cap <= n
        assert cap >= min(n, 1024)


def test_chained_stream_rate_overhead_vs_compressai():
    """At production lane counts the tpu format must be rate-competitive:
    total tpu-format bytes <= 1.02x the CompressAI-format bytes at lanes=8
    on realistic low-bpp symbol statistics (Kodak-like 6-slice geometry,
    most symbols zero under a near-bound sigma). The chained format pays one
    2L flush per stream; the old per-section flush was a ~5-20% tax here."""
    from dc_vic_tpu.ops.rans import encode_with_indexes, tpu_encode_sections
    table = _gaussian_table(scales=(0.11, 0.3, 1.0, 4.0))
    rng = np.random.default_rng(5)
    # true Kodak 768x512 ChARM geometry: yH*yW*slice_ch = 48*32*32 symbols
    # per slice, 6 slices (the fixed flush delta must be judged against
    # real stream sizes, not toy ones)
    n_slices, ns = 6, 49152
    # realistic low-rate stats: sigma near the scale bound almost everywhere
    idx_full = rng.choice(4, n_slices * ns, p=[0.90, 0.07, 0.02, 0.01])
    scale = np.asarray([0.11, 0.3, 1.0, 4.0])[idx_full]
    sym_full = np.round(rng.normal(0, scale)).astype(np.int32)
    idx_full = idx_full.astype(np.int32)

    L = section_lanes(ns, 8)
    assert L == 8
    secs = [(sym_full[s * ns:(s + 1) * ns].reshape(-1, L),
             idx_full[s * ns:(s + 1) * ns].reshape(-1, L))
            for s in range(n_slices)]
    tpu_bytes = len(tpu_encode_sections(secs, table))
    cai_bytes = len(encode_with_indexes(sym_full, idx_full, table))
    assert tpu_bytes <= 1.02 * cai_bytes, (
        f"tpu-format rate overhead too high: {tpu_bytes} vs "
        f"{cai_bytes} compressai bytes ({tpu_bytes / cai_bytes:.3f}x)")


def test_clipped_encode_matches_dense_and_counts_escapes():
    """The driver's clipped=True fast pack must emit byte-identical streams
    to the dense encode for in-range (tier-1-only) escapes, and report the
    same per-section escape counts it previously re-gathered (_esc_max)."""
    table = _gaussian_table()
    dt = DeviceCdfTable(table)
    rng = np.random.default_rng(5)
    B, n, L = 2, 64, 8
    sym = rng.integers(-300, 300, (B, n, L)).astype(np.int32)  # escapes
    idx = rng.integers(0, 4, (B, n, L)).astype(np.int32)
    secs = [(jnp.asarray(sym), jnp.asarray(idx))] * 2

    vd, md = encode_stream(secs, dt)
    vc, mc, esc = encode_stream(secs, dt, clipped=True, with_esc_counts=True)
    pd, cd = pack_streams(vd, md)
    pc, cc = pack_streams(vc, mc)
    assert np.array_equal(np.asarray(cd), np.asarray(cc))
    total = int(np.asarray(cd).sum())
    assert np.array_equal(np.asarray(pd)[:total], np.asarray(pc)[:total])

    # escape counts match a direct count from the table
    off = np.asarray(dt.offsets)[idx]
    maxv = np.asarray(dt.maxv)[idx]
    v = sym - off
    want = ((v < 0) | (v >= maxv)).reshape(B, -1).sum(axis=1)
    got = np.asarray(esc)
    assert got.shape == (B, 2)
    np.testing.assert_array_equal(got[:, 0], want)
    np.testing.assert_array_equal(got[:, 1], want)


def test_tier2_free_decode_matches():
    """tier2=False (container t2free guarantee) must decode tier-1-only
    streams bit-exactly in BOTH escape-epilogue variants — including
    escape-heavy planes like the PRNG-weight bench streams, which is the
    case the fast path exists for."""
    table = _gaussian_table()
    rng = np.random.default_rng(21)
    B, N = 2, 4096
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = np.round(rng.normal(0, 1.5, (B, N))).astype(np.int32)
    # 15% escapes (within esc_cap for the sparse variant), all tier-1
    hot = rng.random((B, N)) < 0.15
    sym = np.where(hot, rng.integers(-20000, 20000, (B, N)),
                   sym).astype(np.int32)
    dt, words, base, L, counts = _encode_for_decode(sym, idx, table)
    for sparse in (False, True):
        dec, cursor, _ = decode_section(
            words, base, jnp.zeros((B,), jnp.int32), None,
            jnp.asarray(idx.reshape(B, -1, L)), dt,
            sparse_esc=sparse, tier2=False)
        assert np.array_equal(np.asarray(dec).reshape(B, -1), sym), sparse
        assert np.array_equal(np.asarray(cursor), counts), sparse


def test_tier2_free_violation_poisons():
    """A tier-2 marker word in a stream decoded under the tier-2-free
    guarantee must poison the cursor (loud integrity failure) instead of
    decoding a garbage raw; the clean image in the same batch still decodes
    exactly."""
    table = _gaussian_table()
    rng = np.random.default_rng(22)
    B, N = 2, 512
    idx = rng.integers(0, 4, (B, N), np.int32)
    sym = np.round(rng.normal(0, 1.5, (B, N))).astype(np.int32)
    sym[1, 7] = 50000  # zigzag >= 2^16: emits a tier-2 pair
    dt, words, base, L, counts = _encode_for_decode(sym, idx, table)
    for sparse in (False, True):
        dec, cursor, _ = decode_section(
            words, base, jnp.zeros((B,), jnp.int32), None,
            jnp.asarray(idx.reshape(B, -1, L)), dt,
            sparse_esc=sparse, tier2=False)
        cur = np.asarray(cursor)
        assert cur[1] >= ESC_POISON, sparse
        assert cur[0] == counts[0], sparse
        assert np.array_equal(np.asarray(dec)[0].reshape(-1), sym[0]), sparse


def test_host_encoder_reports_tier2_presence():
    """The C host encoder's esc_max output must carry the has-tier-2 flag
    the driver turns into the container's t2free guarantee bit."""
    from dc_vic_tpu.ops.rans import tpu_encode_sections
    table = _gaussian_table()
    rng = np.random.default_rng(23)
    n, L = 64, 8
    idx = rng.integers(0, 4, (n, L)).astype(np.int32)
    small = rng.integers(-300, 300, (n, L)).astype(np.int32)
    data, esc, has_t2 = tpu_encode_sections([(small, idx)], table,
                                            return_esc_max=True)
    assert esc > 0 and has_t2 is False
    big = small.copy()
    big[0, 0] = 60000  # zigzag >= 2^16
    data2, esc2, has_t2b = tpu_encode_sections([(big, idx)], table,
                                               return_esc_max=True)
    assert has_t2b is True
    assert esc2 < (1 << 28), "flag bit must be stripped from the count"


def test_clipped_encode_poisons_on_tier2():
    """A symbol whose escape zigzag needs two words (raw >= 2^16) under
    clipped=True must poison the escape count so the driver re-packs dense
    instead of emitting a stream missing its tier-2 words."""
    from dc_vic_tpu.ops.rans_device import CLIP_POISON

    table = _gaussian_table()
    dt = DeviceCdfTable(table)
    B, n, L = 1, 16, 4
    sym = np.zeros((B, n, L), np.int32)
    sym[0, 0, 0] = 50000  # zigzag 2*(50000-maxv) >= 2^16
    idx = np.zeros((B, n, L), np.int32)
    _, _, esc = encode_stream([(jnp.asarray(sym), jnp.asarray(idx))], dt,
                              clipped=True, with_esc_counts=True)
    assert int(np.asarray(esc)[0, 0]) >= CLIP_POISON


def test_escfree_encode_matches_and_counts():
    """The escfree=True speculative pack (r5: ONE compaction update per
    symbol) must emit byte-identical streams to the dense/clipped packs
    whenever no escape fires, and report exact escape counts so the driver
    can detect a speculation miss."""
    table = _gaussian_table()
    dt = DeviceCdfTable(table)
    rng = np.random.default_rng(31)
    B, n, L = 2, 64, 8
    # symbols guaranteed in-range for every row of the table
    idx = rng.integers(0, 4, (B, n, L)).astype(np.int32)
    maxv = np.asarray(dt.maxv)[idx]
    off = np.asarray(dt.offsets)[idx]
    sym = (off + rng.integers(0, 1000, (B, n, L)) % np.maximum(maxv, 1)
           ).astype(np.int32)
    secs = [(jnp.asarray(sym), jnp.asarray(idx))] * 2

    vd, md = encode_stream(secs, dt)
    ve, me, esc = encode_stream(secs, dt, escfree=True, with_esc_counts=True)
    assert np.asarray(esc).sum() == 0
    pd, cd = pack_streams(vd, md)
    pe, ce = pack_streams(ve, me)
    assert np.array_equal(np.asarray(cd), np.asarray(ce))
    total = int(np.asarray(cd).sum())
    assert np.array_equal(np.asarray(pd)[:total], np.asarray(pe)[:total])

    # with escapes present, the exact counts flag the miss
    sym2 = sym.copy()
    sym2[1, 3, 2] = 30000
    _, _, esc2 = encode_stream([(jnp.asarray(sym2), jnp.asarray(idx))], dt,
                               escfree=True, with_esc_counts=True)
    got = np.asarray(esc2)
    assert got[0, 0] == 0 and got[1, 0] >= 1


def test_escfree_decode_matches_and_poisons():
    """decode_section(escfree=True) must decode zero-escape streams
    bit-exactly with the epilogue deleted, and poison the cursor of any
    image whose stream contains an escape despite the guarantee."""
    table = _gaussian_table()
    rng = np.random.default_rng(32)
    B, N = 2, 2048
    idx = rng.integers(0, 4, (B, N), np.int32)
    dt0 = DeviceCdfTable(table)
    maxv = np.asarray(dt0.maxv)[idx]
    off = np.asarray(dt0.offsets)[idx]
    sym = (off + rng.integers(0, 1000, (B, N)) % np.maximum(maxv, 1)
           ).astype(np.int32)
    dt, words, base, L, counts = _encode_for_decode(sym, idx, table,
                                                    n_sections=2)
    ns = N // 2
    cursor = jnp.zeros((B,), jnp.int32)
    state = None
    out = []
    for s in range(2):
        sl = slice(s * ns, (s + 1) * ns)
        dec, cursor, state = decode_section(
            words, base, cursor, state,
            jnp.asarray(idx[:, sl].reshape(B, -1, L)), dt, escfree=True)
        out.append(np.asarray(dec).reshape(B, -1))
    assert np.array_equal(np.concatenate(out, axis=1), sym)
    assert np.array_equal(np.asarray(cursor), counts)

    # violation: an escape symbol in image 1 poisons ONLY image 1's cursor
    sym2 = sym.copy()
    sym2[1, 5] = 32000
    dt, words, base, L, counts = _encode_for_decode(sym2, idx, table)
    dec, cursor, _ = decode_section(
        words, base, jnp.zeros((B,), jnp.int32), None,
        jnp.asarray(idx.reshape(B, -1, L)), dt, escfree=True)
    cur = np.asarray(cursor)
    assert cur[1] >= ESC_POISON
    assert cur[0] == counts[0]
    assert np.array_equal(np.asarray(dec)[0].reshape(-1), sym2[0])
