"""rANS codec + CDF table tests: round-trip bit-exactness is THE codec
correctness property (the reference's commented-out allclose check at
scripts/compress.py:137-138, made real)."""
import numpy as np
import pytest

from dc_vic_tpu.ops.cdf import build_cdf_rows, pmf_to_quantized_cdf
from dc_vic_tpu.ops.rans import (
    CdfTable,
    RansDecoder,
    RansEncoder,
    decode_with_indexes,
    encode_with_indexes,
)


def _gaussian_table(scales, support=32, tail_mass=1e-9):
    """Build a toy Gaussian CDF table with symmetric support per scale."""
    from scipy.stats import norm

    rows = len(scales)
    pmf_length = 2 * support + 1
    pmfs = np.zeros((rows, pmf_length))
    tails = np.zeros(rows)
    for i, s in enumerate(scales):
        x = np.arange(-support, support + 1)
        upper = norm.cdf((x + 0.5) / s)
        lower = norm.cdf((x - 0.5) / s)
        pmfs[i] = np.maximum(upper - lower, 0)
        tails[i] = max(1.0 - pmfs[i].sum(), tail_mass)
    lengths = np.full(rows, pmf_length, dtype=np.int64)
    cdfs = build_cdf_rows(pmfs, tails, lengths, pmf_length)
    offsets = np.full(rows, -support, dtype=np.int32)
    return CdfTable(cdfs, lengths + 2, offsets)


def test_pmf_to_quantized_cdf_properties():
    pmf = [0.1, 0.2, 0.3, 0.4, 1e-9]
    cdf = pmf_to_quantized_cdf(pmf)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) > 0)
    # Frequencies roughly proportional to probabilities.
    freqs = np.diff(cdf).astype(float) / (1 << 16)
    np.testing.assert_allclose(freqs[:4], pmf[:4], atol=2e-4)


def test_pmf_zero_bin_repair():
    pmf = [0.5, 0.0, 0.5, 1e-12]
    cdf = pmf_to_quantized_cdf(pmf)
    assert np.all(np.diff(cdf) > 0)
    assert cdf[-1] == 1 << 16


def test_roundtrip_in_range():
    rng = np.random.default_rng(0)
    table = _gaussian_table([0.5, 1.0, 4.0, 16.0])
    n = 5000
    indexes = rng.integers(0, 4, n)
    scales = np.array([0.5, 1.0, 4.0, 16.0])[indexes]
    symbols = np.clip(np.round(rng.normal(0, scales)), -30, 30).astype(np.int32)
    stream = encode_with_indexes(symbols, indexes, table)
    assert len(stream) > 0
    decoded = decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(decoded, symbols)


def test_roundtrip_escape_values():
    """Out-of-support values must survive via bypass/escape coding."""
    rng = np.random.default_rng(1)
    table = _gaussian_table([1.0], support=8)
    symbols = np.array([-1000000, -100, -9, 0, 9, 100, 54321, 7, -7],
                       dtype=np.int32)
    indexes = np.zeros(len(symbols), dtype=np.int32)
    stream = encode_with_indexes(symbols, indexes, table)
    decoded = decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(decoded, symbols)


def test_streaming_matches_oneshot():
    """Per-slice streaming decode (ChARM path) must read the same single
    stream that a one-shot encode produced."""
    rng = np.random.default_rng(2)
    table = _gaussian_table([0.7, 2.0, 8.0])
    slices = []
    all_symbols, all_indexes = [], []
    for _ in range(6):
        n = 500
        idx = rng.integers(0, 3, n)
        sym = np.round(rng.normal(0, 3, n)).astype(np.int32)
        slices.append((sym, idx))
        all_symbols.append(sym)
        all_indexes.append(idx)

    stream = encode_with_indexes(
        np.concatenate(all_symbols), np.concatenate(all_indexes), table
    )

    dec = RansDecoder(stream)
    for sym, idx in slices:
        out = dec.decode_stream(idx, table)
        np.testing.assert_array_equal(out, sym)


def test_streaming_encoder_matches_oneshot():
    rng = np.random.default_rng(3)
    table = _gaussian_table([0.7, 2.0])
    enc = RansEncoder()
    all_symbols, all_indexes = [], []
    for _ in range(4):
        n = 300
        idx = rng.integers(0, 2, n)
        sym = np.round(rng.normal(0, 2, n)).astype(np.int32)
        enc.push(sym, idx, table)
        all_symbols.append(sym)
        all_indexes.append(idx)
    stream_a = enc.flush()
    stream_b = encode_with_indexes(
        np.concatenate(all_symbols), np.concatenate(all_indexes), table
    )
    assert stream_a == stream_b


def test_compression_efficiency():
    """Coded size should be close to the entropy of the source."""
    rng = np.random.default_rng(4)
    scale = 2.0
    table = _gaussian_table([scale])
    n = 50000
    symbols = np.round(rng.normal(0, scale, n)).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    stream = encode_with_indexes(symbols, indexes, table)
    # Differential entropy-based estimate of bits/symbol for a discretized
    # Gaussian: ~0.5*log2(2*pi*e*scale^2).
    h = 0.5 * np.log2(2 * np.pi * np.e * scale**2)
    bits_per_symbol = len(stream) * 8 / n
    assert bits_per_symbol < h * 1.05 + 0.1, (bits_per_symbol, h)


def test_empty_stream():
    table = _gaussian_table([1.0])
    stream = encode_with_indexes([], [], table)
    decoded = decode_with_indexes(stream, [], table)
    assert len(decoded) == 0
