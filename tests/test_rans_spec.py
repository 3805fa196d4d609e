"""Double-entry verification of the CompressAI-format C coder.

CompressAI golden byte vectors cannot be generated in this image (no
network / no compressai wheel), so the next-strongest evidence is an
INDEPENDENT implementation of the published stream spec — the 64-bit rANS
of ryg/rans64.h with CompressAI's escape layout (16-bit precision, 4-bit
saturating bypass chunks, two little-endian 32-bit flush words) — written
here in pure Python directly from the spec, and byte-compared against
ops/rans/rans.cpp. Any transcription error in either implementation breaks
the equality; agreement means both implement the same spec.

Spec sources: compressai/cpp_exts/rans/rans_interface.cpp (BSD) semantics as
documented in the CompressAI docs, and Fabian Giesen's public rans64.h
algorithm. No code was copied; this is a from-scratch spec implementation
(ref usage site: src/models/subnet/context_model/
minnen20_charm_context_model.py:179-203).
"""
import numpy as np
import pytest

from dc_vic_tpu.ops.rans import (
    CdfTable,
    decode_with_indexes,
    encode_with_indexes,
)

PREC = 16
BYPASS = 4
MAX_BP = (1 << BYPASS) - 1
RANS64_L = 1 << 31


class PySpecEncoder:
    """Pure-Python rANS64 encoder following the CompressAI stream spec."""

    def __init__(self, table: CdfTable):
        self.cdfs = np.asarray(table.cdfs, np.int64)
        self.lengths = np.asarray(table.cdf_lengths, np.int64)
        self.offsets = np.asarray(table.offsets, np.int64)

    def _put(self, x, words, start, freq):
        # Rans64EncPut: renorm emits the low 32 bits when x would overflow
        x_max = ((RANS64_L >> PREC) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        return ((x // freq) << PREC) + (x % freq) + start

    def _put_bits(self, x, words, val, nbits):
        freq = 1 << (PREC - nbits)
        x_max = ((RANS64_L >> PREC) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        return (x << nbits) | val

    def encode(self, symbols, indexes) -> bytes:
        # Build the forward list of operations, then run them in reverse
        # (the spec encodes back to front); emitted words are prepended.
        x = RANS64_L
        rev_words = []  # words in emission order (stream is its reverse)
        for sym, i in zip(reversed(symbols), reversed(indexes)):
            cdf = self.cdfs[i]
            max_value = int(self.lengths[i]) - 2
            value = int(sym) - int(self.offsets[i])
            raw = None
            if value < 0:
                raw = -2 * value - 1
                value = max_value
            elif value >= max_value:
                raw = 2 * (value - max_value)
                value = max_value
            if raw is not None:
                # decoder reads: count chunks (15-saturating), then raw
                # chunks LSB-first -> encoder runs that list backwards
                nb = 0
                while (raw >> (nb * BYPASS)) != 0:
                    nb += 1
                for j in range(nb - 1, -1, -1):
                    x = self._put_bits(x, rev_words,
                                       (raw >> (j * BYPASS)) & MAX_BP, BYPASS)
                v, n15 = nb, 0
                while v >= MAX_BP:
                    v -= MAX_BP
                    n15 += 1
                x = self._put_bits(x, rev_words, v, BYPASS)
                for _ in range(n15):
                    x = self._put_bits(x, rev_words, MAX_BP, BYPASS)
            start = int(cdf[value])
            freq = int(cdf[value + 1]) - start
            x = self._put(x, rev_words, start, freq)
        stream = [x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF] + rev_words[::-1]
        return np.asarray(stream, np.uint32).tobytes()


def _table(scales=(0.3, 1.0, 8.0, 64.0)) -> CdfTable:
    from dc_vic_tpu.codec.gaussian import GaussianConditional
    return GaussianConditional().build_cdf_table(np.asarray(scales))


@pytest.mark.parametrize("seed,n,esc_rate", [
    (0, 1000, 0.0),
    (1, 1000, 0.1),
    (2, 5000, 0.4),
    (3, 64, 1.0),
])
def test_c_coder_matches_python_spec(seed, n, esc_rate):
    table = _table()
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, n).astype(np.int32)
    scale = np.asarray([0.3, 1.0, 8.0, 64.0])[idx]
    sym = np.round(rng.normal(0, scale)).astype(np.int32)
    hot = rng.random(n) < esc_rate
    sym = np.where(hot, rng.integers(-100000, 100000, n), sym).astype(np.int32)

    c_bytes = encode_with_indexes(sym, idx, table)
    py_bytes = PySpecEncoder(table).encode(sym, idx)
    assert c_bytes == py_bytes, (
        f"C coder diverges from the pure-Python spec implementation "
        f"(len {len(c_bytes)} vs {len(py_bytes)})")
    # and the C decoder inverts the Python-spec bytes
    dec = decode_with_indexes(py_bytes, idx, table)
    np.testing.assert_array_equal(dec, sym)


def _spec_equal(sym, idx, table):
    """Assert C bytes == PySpec bytes and the C decoder inverts them."""
    sym = np.asarray(sym, np.int32)
    idx = np.asarray(idx, np.int32)
    c_bytes = encode_with_indexes(sym, idx, table)
    py_bytes = PySpecEncoder(table).encode(sym, idx)
    assert c_bytes == py_bytes, (
        f"C coder diverges from the pure-Python spec implementation "
        f"(len {len(c_bytes)} vs {len(py_bytes)})")
    np.testing.assert_array_equal(
        decode_with_indexes(c_bytes, idx, table), sym)
    return c_bytes


@pytest.mark.parametrize("seed", range(4))
def test_spec_long_escape_chains(seed):
    """Escape raws spanning 4..8 bypass chunks (the existing cases top out
    at ~5): |value| up to 2**29 — the int32-arithmetic bound both CompressAI
    and the C coder share (value/raw math is int32_t; beyond 2**30 the
    reference itself overflows, so that is outside the spec's domain). The
    15-saturating chunk-count path (nb >= 15) needs raw >= 2**56 and is
    unreachable from int32 symbols by construction."""
    table = _table()
    rng = np.random.default_rng(100 + seed)
    n = 512
    idx = rng.integers(0, 4, n).astype(np.int32)
    mag = rng.integers(4 * 4, 8 * 4 + 1, n)          # chunks*4 bits of raw
    raw_target = (np.int64(1) << mag) - 1
    sym = np.where(rng.random(n) < 0.5,
                   -(raw_target // 2) - 1,            # negative branch
                   raw_target // 2 + 64)              # >= max_value branch
    sym = np.clip(sym, -(1 << 29), (1 << 29) - 1).astype(np.int32)
    _spec_equal(sym, idx, table)


def test_spec_cdf_length_extremes():
    """Rows at both ends of the legal cdf_length range: a 2-bin row (the
    escape bin IS the whole row — every symbol bypass-codes) and a 300-bin
    row (beyond the 64-entry scale table the codec uses)."""
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    # row 0: single-bin pmf -> cdf [0, 2^16], length 2, max_value 0
    tiny = pmf_to_quantized_cdf([1.0])
    # row 1: 299 content bins + tail -> length 301
    rng = np.random.default_rng(7)
    pmf = rng.random(299) + 0.01
    pmf = pmf / pmf.sum() * (1 - 1e-4)
    big = pmf_to_quantized_cdf(np.concatenate([pmf, [1e-4]]))
    cols = len(big)
    cdfs = np.zeros((2, cols), np.int32)
    cdfs[0, :len(tiny)] = tiny
    cdfs[1] = big
    table = CdfTable(cdfs, [len(tiny), cols], [-3, 40])
    n = 4000
    idx = rng.integers(0, 2, n).astype(np.int32)
    # row-0 symbols all escape (max_value=0); row-1 mostly in range
    sym = np.where(idx == 0, rng.integers(-2000, 2000, n),
                   rng.integers(30, 360, n)).astype(np.int32)
    _spec_equal(sym, idx, table)


def test_spec_offset_extremes():
    """Per-index offsets at +-(2**28): the escape zigzag then runs off a
    far-shifted origin in both directions (value = sym - offset stays
    within the int32 spec domain)."""
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    cdf = pmf_to_quantized_cdf([0.5, 0.3, 0.2 - 1e-4, 1e-4])
    cdfs = np.stack([cdf, cdf])
    table = CdfTable(cdfs, [len(cdf), len(cdf)], [1 << 28, -(1 << 28)])
    rng = np.random.default_rng(11)
    n = 2048
    idx = rng.integers(0, 2, n).astype(np.int32)
    base = np.where(idx == 0, 1 << 28, -(1 << 28))
    sym = (base + rng.integers(-64, 64, n)).astype(np.int32)
    _spec_equal(sym, idx, table)


def test_spec_multi_mb_symbol_plane():
    """A 1.5M-symbol plane (one ChARM slice of a large image is ~0.8M):
    exercises encoder buffer growth, long renorm runs, and decoder LUT
    paths at production scale. PySpec is pure Python, so this is also the
    slowest spec case (~10 s)."""
    table = _table()
    rng = np.random.default_rng(42)
    n = 1_500_000
    idx = rng.integers(0, 4, n).astype(np.int32)
    scale = np.asarray([0.3, 1.0, 8.0, 64.0])[idx]
    sym = np.round(rng.normal(0, scale)).astype(np.int32)
    hot = rng.random(n) < 0.02
    sym = np.where(hot, rng.integers(-(1 << 20), 1 << 20, n),
                   sym).astype(np.int32)
    _spec_equal(sym, idx, table)


@pytest.mark.parametrize("seed", range(6))
def test_spec_fuzz_random_tables(seed):
    """Hypothesis-style fuzz: random table shapes (1-8 rows, 2-70 bins),
    random offsets, and symbol mixtures spanning in-range, mild-escape, and
    deep-escape regimes — every draw must produce byte-identical C/PySpec
    streams and an exact decode."""
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    rng = np.random.default_rng(1000 + seed)
    rows = int(rng.integers(1, 9))
    cdf_list, lengths = [], []
    for _ in range(rows):
        k = int(rng.integers(1, 70))
        pmf = rng.random(k) ** float(rng.integers(1, 5)) + 1e-9
        tail = float(rng.random() * 1e-2)
        pmf = pmf / pmf.sum() * (1 - tail)
        cdf_list.append(pmf_to_quantized_cdf(np.concatenate([pmf, [tail]])))
        lengths.append(len(cdf_list[-1]))
    cols = max(lengths)
    cdfs = np.zeros((rows, cols), np.int32)
    for r, c in enumerate(cdf_list):
        cdfs[r, :len(c)] = c
    offsets = rng.integers(-30000, 30000, rows).astype(np.int32)
    table = CdfTable(cdfs, lengths, offsets)
    n = int(rng.integers(1, 20000))
    idx = rng.integers(0, rows, n).astype(np.int32)
    off = offsets[idx]
    maxv = (np.asarray(lengths, np.int32) - 2)[idx]
    regime = rng.random(n)
    inr = off + rng.integers(0, 1 << 14, n) % np.maximum(maxv, 1)
    mild = off + rng.integers(-300, 300, n)
    deep = off + rng.integers(-(1 << 29), 1 << 29, n)
    sym = np.where(regime < 0.6, inr,
                   np.where(regime < 0.9, mild, deep)).astype(np.int32)
    _spec_equal(sym, idx, table)


def test_compressai_golden_vectors_if_present():
    """Byte-level check against TRUE CompressAI outputs. The vectors are
    produced by running `python scripts/parity_check.py
    --print_golden_snippet` in any compressai-bearing environment and
    dropping the resulting compressai_vectors.npz into tests/golden/.
    Until then this skips — the double-entry PySpecEncoder check above is
    the in-environment evidence (both implementations could in principle
    share one spec misreading; this retires that residual risk)."""
    import os

    import pytest
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "compressai_vectors.npz")
    if not os.path.exists(path):
        pytest.skip("no compressai golden vectors vendored "
                    "(see scripts/parity_check.py --print_golden_snippet)")
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    from dc_vic_tpu.ops.rans import CdfTable, decode_with_indexes
    data = np.load(path)
    t = 0
    while f"cdf_{t}" in data:
        np.testing.assert_array_equal(
            pmf_to_quantized_cdf(data[f"pmf_{t}"]), data[f"cdf_{t}"],
            err_msg=f"CDF table bytes diverge from compressai (case {t})")
        cdf = data[f"cdf_{t}"]
        table = CdfTable(cdf[None], [len(cdf)], [int(data[f"offset_{t}"])])
        got = encode_with_indexes(data[f"sym_{t}"], data[f"idx_{t}"], table)
        assert got == data[f"bytes_{t}"].tobytes(), (
            f"stream bytes diverge from compressai (case {t})")
        dec = decode_with_indexes(data[f"bytes_{t}"].tobytes(),
                                  data[f"idx_{t}"], table)
        np.testing.assert_array_equal(dec, data[f"sym_{t}"])
        t += 1
    assert t > 0


def test_pmf_to_quantized_cdf_exact_fixtures():
    """Pin the exact integer outputs of pmf_to_quantized_cdf (not just the
    invariants): constants hand-derived by stepping through the published
    CompressAI algorithm (round -> uint32 renormalize -> partial_sum ->
    zero-bin steal from the lowest freq>1 bin; ref usage:
    src/models/comp_model/hyperprior_dc_vic_model.py:66-68). Bitstream
    parity depends on these table bytes, so they are locked here.

    Derivations (precision=16):
      * [0.5,0.25,0.25]: rounds to [32768,16384,16384], total=2^16 so the
        renormalize is identity; prefix sum.
      * [0.3,0.3,0.4]: 0.3*65536=19660.8 rounds UP (half away from zero),
        0.4*65536=26214.4 rounds down; total is exactly 2^16.
      * [0.6,0.6]: unnormalized pmf, total=78644 != 2^16 exercises the
        floor((2^16*c)/total) renormalize: floor(65536*39322/78644)=32768
        for both entries (then cdf.back() forced to 2^16).
      * [1.0,1e-9,1e-9]: two zero bins AFTER the mass -> two successive
        steals from bin 0 (best_steal < i decrements cdf[steal+1..i]).
      * [1e-9,1.0,1e-9]: zero bins on BOTH sides -> one steal to the right
        (best_steal > i increments cdf[i+1..steal]) and one to the left.
      * [0.2,0.0,0.5,0.3]: interior zero bin; lowest freq>1 donor is bin 0
        (13107), not the largest bin.
    """
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    fixtures = [
        ([0.5, 0.25, 0.25], [0, 32768, 49152, 65536]),
        ([0.3, 0.3, 0.4], [0, 19661, 39322, 65536]),
        ([0.6, 0.6], [0, 32768, 65536]),
        ([1.0, 1e-9, 1e-9], [0, 65534, 65535, 65536]),
        ([1e-9, 1.0, 1e-9], [0, 1, 65535, 65536]),
        ([0.2, 0.0, 0.5, 0.3], [0, 13106, 13107, 45875, 65536]),
    ]
    for pmf, want in fixtures:
        got = pmf_to_quantized_cdf(pmf).tolist()
        assert got == want, f"pmf={pmf}: got {got}, want {want}"


def test_pmf_to_quantized_cdf_spec():
    """ops/cdf.py must satisfy the CompressAI CDF invariants: cdf[0] == 0,
    cdf[-1] == 2^16, strictly increasing (no zero-width bins), and the
    escape bin absorbs the tail mass."""
    from dc_vic_tpu.ops.cdf import pmf_to_quantized_cdf
    rng = np.random.default_rng(0)
    for trial in range(20):
        k = int(rng.integers(1, 40))
        pmf = rng.random(k) ** 4  # spiky, provokes zero-width bins
        tail = float(rng.random() * 1e-3)
        pmf = pmf / pmf.sum() * (1 - tail)
        cdf = pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]))
        assert cdf[0] == 0 and cdf[-1] == (1 << 16)
        assert np.all(np.diff(cdf) >= 1), "zero-width bin survived"
        assert len(cdf) == k + 2
