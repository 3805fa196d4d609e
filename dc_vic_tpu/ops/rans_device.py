"""Device-side interleaved rANS entropy codec (the "tpu" stream format).

The reference entropy-codes on the CPU through compressai.ans, forcing a
host<->device round trip per ChARM slice (ref: src/models/subnet/
context_model/minnen20_charm_context_model.py:179-203). Here the coder runs
ON the accelerator as pure jnp (VPU element-wise + small gathers), so:

  * encode: symbol planes never cross the host link — only the final
    entropy-coded bytes do;
  * decode: the entire ChARM slice chain (entropy decode -> slice
    reconstruct -> next-slice params) is ONE jitted graph — zero host
    round trips inside the autoregressive loop.

Scheme: rANS with 32-bit state, 16-bit renormalization words, 16-bit
probability precision (the uint32-friendly variant of the 64-bit coder in
ops/rans/rans.cpp — TPUs have no native 64-bit integer path). Each stream is
split into L interleaved lanes that advance in lockstep; emitted words share
one stream in a canonical (step, slot, lane) order, so no per-lane length
table is needed — the decoder's renormalization pattern reproduces the
encoder's emission pattern exactly (Giesen-style interleaved rANS).

Within one step (one symbol per lane) the decoder consumes, in order:
  slot 0:      the CDF-advance renorm word      (iff state underflowed)
  slot 1:      the escape chunk-count renorm    (iff escape + underflow)
  slot 2 + j:  the j-th 4-bit-chunk renorm      (iff escape, j < count,
                                                 + underflow)
each slot taking its lanes in ascending order. A stream starts with 2 words
per lane (little-endian final encoder state). Escape values use the same
zigzag mapping and 4-bit bypass chunks as the CompressAI-format coder
(value < 0 -> -2v-1, value >= max -> 2(v-max); chunks LSB-first), except the
chunk count is a single 4-bit field instead of a saturating chain — raw
escape payloads are bounded to 2^20-1 (MAX_CHUNKS=5), far beyond the model
layer's +-32000 symbol clip.

Probabilities are the same quantized CDF rows as the host coder, so the
coded size matches the CompressAI format up to the per-lane flush overhead
(4 bytes x LANES per stream; see PERF.md for the rate/latency trade-off).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rans import CdfTable

PRECISION = 16
RANS_L = 1 << 16          # state lower bound; state in [2^16, 2^32)
LANES = 128               # max interleaved lanes per stream (see module doc)
MAX_CHUNKS = 5            # escape raw <= 2^20-1, in 4-bit chunks
WORST_WORDS_PER_SYM = 2 + MAX_CHUNKS  # cdf renorm + count + chunks


def section_lanes(n_symbols: int) -> int:
    """Lane count for a section (both coder sides derive it from the symbol
    count alone): a power-of-two divisor of n_symbols, <= LANES, and small
    enough that each lane carries >= 16 symbols — flush overhead is 4 bytes
    per lane, so tiny sections get few lanes."""
    target = 1
    while target * 2 <= min(LANES, max(1, n_symbols // 16)):
        target *= 2
    return math.gcd(n_symbols, target)


class DeviceCdfTable:
    """Device-resident CDF table: packed (start | freq<<16) rows plus a dense
    2^16 cum->symbol LUT (same layout idea as the C library's prepared
    tables, ops/rans/rans.cpp:109-122)."""

    def __init__(self, table: CdfTable):
        cdfs = np.asarray(table.cdfs, np.int64)          # [rows, cols]
        lengths = np.asarray(table.cdf_lengths, np.int64)
        rows, cols = cdfs.shape
        self.cols = cols - 1  # pair-table row stride ((start, freq) per bin)

        starts = cdfs[:, :-1]
        freqs = cdfs[:, 1:] - cdfs[:, :-1]
        valid = np.arange(cols - 1)[None, :] < (lengths - 1)[:, None]
        pair = np.where(valid, starts | (np.maximum(freqs, 1) << 16), 1 << 16)
        self.pair_flat = jnp.asarray(pair.astype(np.uint32).reshape(-1))

        lut = np.zeros((rows, 1 << PRECISION), np.int32)
        cum = np.arange(1 << PRECISION)
        for r in range(rows):
            n = int(lengths[r])
            lut[r] = np.searchsorted(cdfs[r, :n], cum, side="right") - 1
        self.lut_flat = jnp.asarray(lut.reshape(-1))

        self.offsets = jnp.asarray(np.asarray(table.offsets, np.int32))
        self.maxv = jnp.asarray((lengths - 2).astype(np.int32))


def _precompute(sym: jnp.ndarray, idx: jnp.ndarray, table: DeviceCdfTable):
    """Per-symbol escape handling + (start, freq) lookup, fully vectorized
    (the only sequential part of rANS is the state recurrence)."""
    off = jnp.take(table.offsets, idx, mode="clip")
    maxv = jnp.take(table.maxv, idx, mode="clip")
    value = sym - off
    esc = (value < 0) | (value >= maxv)
    raw = jnp.where(value < 0, -2 * value - 1, 2 * (value - maxv))
    raw = jnp.minimum(raw, (1 << (4 * MAX_CHUNKS)) - 1).astype(jnp.uint32)
    count = sum((raw >> (4 * j) != 0).astype(jnp.uint32)
                for j in range(MAX_CHUNKS))
    value = jnp.where(esc, maxv, value)
    pair = jnp.take(table.pair_flat, idx * table.cols + value, mode="clip")
    start = pair & jnp.uint32(0xFFFF)
    freq = pair >> 16
    return start, freq, esc, raw, count


def encode_sections(sym: jnp.ndarray, idx: jnp.ndarray,
                    table: DeviceCdfTable
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode one section batch: sym/idx [B, n, L] int32.

    Returns (vals [B, K] uint16, mask [B, K] bool): each image's stream words
    in canonical order with a validity mask; K = 2L + (2+MAX_CHUNKS)nL is
    the static worst case. Pack with pack_streams()."""
    B, n, L = sym.shape
    start, freq, esc, raw, count = _precompute(sym, idx, table)
    # [n, B, L] scan layout
    tr = lambda a: a.transpose(1, 0, 2)
    xs_in = (tr(start).astype(jnp.uint32), tr(freq).astype(jnp.uint32),
             tr(esc), tr(raw), tr(count))

    def put_bits4(x, val, active):
        """Masked put_bits(val, 4): emit conditionally, shift val in."""
        renorm = active & (x >= jnp.uint32(1 << 28))
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(renorm, x >> 16, x)
        x = jnp.where(active, (x1 << 4) | val, x1)
        return x, w, renorm

    def body(x, inp):
        start, freq, esc, raw, count = inp
        # encoder runs in reverse decode order: chunks MSB-first, then the
        # chunk count, then the CDF symbol
        chunk_ws = [None] * MAX_CHUNKS
        for j in range(MAX_CHUNKS - 1, -1, -1):
            active = esc & (count > j)
            x, w, m = put_bits4(x, (raw >> (4 * j)) & jnp.uint32(0xF),
                                active)
            chunk_ws[j] = (w, m)                 # decode slot 2 + j
        x, w_cnt, m_cnt = put_bits4(x, count, esc)
        renorm = x >= (freq << 16)
        w_c = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(renorm, x >> 16, x)
        x = ((x1 // freq) << 16) | ((x1 % freq) + start)
        ws = (w_c, renorm, w_cnt, m_cnt) + tuple(
            v for pair in chunk_ws for v in pair)
        return x, ws

    x0 = jnp.full((B, L), RANS_L, jnp.uint32)
    # reverse=True: symbols are encoded last-to-first (rANS requirement) and
    # the stacked outputs still land at their forward step index.
    x_fin, ys = jax.lax.scan(body, x0, xs_in, reverse=True)

    S = 2 + MAX_CHUNKS
    words = jnp.stack(ys[0::2], axis=1)   # [n, S, B, L] decode-slot-major
    mask = jnp.stack(ys[1::2], axis=1)
    words = words.transpose(2, 0, 1, 3).reshape(B, -1)  # (t, slot, lane)
    mask = mask.transpose(2, 0, 1, 3).reshape(B, -1)

    flush = jnp.stack([(x_fin & jnp.uint32(0xFFFF)).astype(jnp.uint16),
                       (x_fin >> 16).astype(jnp.uint16)],
                      axis=-1).reshape(B, 2 * L)
    vals = jnp.concatenate([flush, words], axis=1)
    mask = jnp.concatenate([jnp.ones((B, 2 * L), bool), mask], axis=1)
    return vals, mask


def pack_streams(vals: jnp.ndarray, mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact per-image masked words into one flat buffer.

    vals/mask [B, K] (concatenate sections along axis 1 first). Returns
    (packed [B*K] uint16 — only the first sum(counts) entries meaningful —
    and counts [B] int32). One sorted-unique scatter; everything stays on
    device until the host slices off the real prefix."""
    B, K = vals.shape
    pos = jnp.cumsum(mask, axis=1, dtype=jnp.int32)
    counts = pos[:, -1]
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    tgt = jnp.where(mask, base[:, None] + pos - 1, B * K)
    packed = jnp.zeros((B * K,), jnp.uint16)
    packed = packed.at[tgt.reshape(-1)].set(vals.reshape(-1), mode="drop")
    return packed, counts


def decode_section(words: jnp.ndarray, img_base: jnp.ndarray,
                   cursor: jnp.ndarray, state: jnp.ndarray,
                   idx: jnp.ndarray, table: DeviceCdfTable
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one section: idx [B, n, L] int32 -> symbols [B, n, L] int32.

    words: flat uint16 buffer (all images' streams back to back);
    img_base [B]: each image's stream start (in words);
    cursor [B]: per-image word offset (carries across sections of the same
    stream, e.g. consecutive ChARM slices);
    state: ignored placeholder (pass None) — each section re-inits lanes.
    Returns (symbols, new_cursor, final lane states [B, L])."""
    del state
    B, n, L = idx.shape
    off = jnp.take(table.offsets, idx, mode="clip")
    maxv = jnp.take(table.maxv, idx, mode="clip")
    tr = lambda a: a.transpose(1, 0, 2)
    xs_in = (tr(idx), tr(off), tr(maxv))

    # lane init: 2 little-endian words per lane, lanes ascending
    lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
    gidx = img_base[:, None] + cursor[:, None] + lane2
    low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
    high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
    x0 = low | (high << 16)
    cursor = cursor + 2 * L

    def renorm(x, cur, need):
        """Refill `need` lanes from the shared stream: lane ranks = prefix
        counts keep the canonical slot order."""
        pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
        widx = img_base[:, None] + cur[:, None] + pos - 1
        w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | w, x)
        return x, cur + pos[:, -1]

    def get_bits4(x, cur, active):
        val = (x & jnp.uint32(0xF)).astype(jnp.uint32)
        xs = x >> 4
        xs, cur = renorm(xs, cur, active & (xs < RANS_L))
        return val, jnp.where(active, xs, x), cur

    def body(carry, inp):
        x, cur = carry
        idx_t, off_t, maxv_t = inp
        cum = x & jnp.uint32(0xFFFF)
        s = jnp.take(table.lut_flat,
                     idx_t * (1 << PRECISION) + cum.astype(jnp.int32),
                     mode="clip")
        pair = jnp.take(table.pair_flat, idx_t * table.cols + s, mode="clip")
        start = pair & jnp.uint32(0xFFFF)
        freq = pair >> 16
        x = freq * (x >> 16) + cum - start
        x, cur = renorm(x, cur, x < RANS_L)

        esc = s == maxv_t
        count, x, cur = get_bits4(x, cur, esc)
        raw = jnp.zeros_like(x)
        for j in range(MAX_CHUNKS):
            chunk, x, cur = get_bits4(x, cur, esc & (count > j))
            raw = raw | jnp.where(count > j, chunk << (4 * j), 0)

        raw = raw.astype(jnp.int32)
        value = jnp.where(
            esc,
            jnp.where(raw & 1 == 1, -(raw >> 1) - 1, (raw >> 1) + maxv_t),
            s)
        return (x, cur), value + off_t

    (x_fin, cursor), sym = jax.lax.scan(body, (x0, cursor), xs_in)
    return sym.transpose(1, 0, 2), cursor, x_fin
