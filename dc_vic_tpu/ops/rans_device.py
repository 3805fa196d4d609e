"""Device-side interleaved rANS entropy codec (the "tpu" stream format).

The reference entropy-codes on the CPU through compressai.ans, forcing a
host<->device round trip per ChARM slice (ref: src/models/subnet/
context_model/minnen20_charm_context_model.py:179-203). Here the DECODER
runs ON the accelerator as pure jnp, so the entire ChARM slice chain
(entropy decode -> slice reconstruct -> next-slice params) is ONE jitted
graph — zero host round trips inside the autoregressive loop. The matching
encoder exists both as jnp (this module) and as C (ops/rans/rans.cpp,
dcvic_tpu_encode_section) — the codec pipeline encodes on the HOST, where
the byte work overlaps device compute, and decodes on the device.

Scheme: rANS with 32-bit state, 16-bit renormalization words, 16-bit
probability precision (the uint32-friendly variant of the 64-bit coder in
ops/rans/rans.cpp — TPUs have no native 64-bit integer path). Each stream is
split into L interleaved lanes that advance in lockstep; emitted words share
one stream in canonical (step, lane) order, so no per-lane length table is
needed — the decoder's renormalization pattern reproduces the encoder's
emission pattern exactly (Giesen-style interleaved rANS).

Stream layout (one stream = all ChARM slices of one image's y, or its z;
one section = one ChARM slice). Lane states CHAIN across the sections of a
stream — they are encoded in reverse section order carrying the rANS states
through, so a stream pays exactly ONE 2L-word flush regardless of section
count (v2 flushed per section: ~5-20% rate tax at the reference's low-bpp
operating points with production lane counts):

  [2L flush words][sec0: renorm (step, lane) order | tier-1 | tier-2]
                  [sec1: renorm | tier-1 | tier-2] ...

Escapes use the CompressAI zigzag (value < 0 -> -2v-1, value >= max ->
2(v-max)) but the raw payload is NOT bypass-coded into the rANS stream —
it lives in a plain side channel: one tier-1 word per escape (the raw, or
the 0xFFFF marker), then two tier-2 words (raw low/high 16) per marked
escape. This keeps the decode scan's critical path at ONE table gather per
symbol: TPU random-index gathers serialize per element, so every gather
removed from the sequential scan is won back directly (see PERF.md).

Probabilities are the same quantized CDF rows as the host coder, so the
coded size matches the CompressAI format up to the per-lane flush overhead
(4 bytes x lanes per stream) and ~4 extra bits per (rare) escape.
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
TIER1_MARKER = 0xFFFF     # side-channel: raw >= 0xFFFF spills to tier 2
WORST_WORDS_PER_SYM = 4   # renorm + tier-1 + 2 tier-2
ESC_FLAG = 1 << 30        # escape marker bit in the dense value table
ESC_POISON = 1 << 26      # cursor poison when a section overflows esc_cap


def scan_unroll() -> int:
    """Unroll factor for the sequential decode scan (DCVIC_SCAN_UNROLL,
    default 4). The scan's per-step cost is dominated by while-loop
    bookkeeping, not the per-symbol table gather (PERF.md §4); unrolling
    replicates the body inside each loop iteration, amortizing that fixed
    cost. Purely an execution-schedule knob — decoded symbols are identical
    for any value."""
    import os
    return max(1, int(os.environ.get("DCVIC_SCAN_UNROLL", "4")))


def esc_cap(n_symbols: int) -> int:
    """Static escape-table capacity for the sparse decode epilogue. TPU
    random gathers serialize at ~9 ns/element regardless of table size
    (scripts/rans_sidechannel_probe.py), so the dense escape side-channel
    decode — three gathers of ALL n symbols — costs ~27 ns/symbol even
    though escapes are rare. The sparse epilogue instead materializes at
    most esc_cap(n) escapes per image (small block reads + one dense
    rank->value mapping). Realistic streams sit far below n/8 escapes; the
    encoder flags streams that exceed it (container header bit) so the
    decoder falls back to the always-exact dense epilogue, and the decode
    cursor is poisoned with ESC_POISON on overflow so a mis-flagged stream
    fails the driver's consumed-words integrity check instead of silently
    decoding garbage."""
    return min(n_symbols, max(1024, n_symbols // 8))


def section_lanes(n_symbols: int, cap: int = LANES) -> int:
    """Lane count for a section (both coder sides derive it from the symbol
    count and the stream's lane cap, which travels in the container header):
    a power-of-two divisor of n_symbols, <= cap, and small enough that each
    lane carries >= 16 symbols — flush overhead is 4 bytes per lane, so tiny
    sections get few lanes. Higher caps trade rate (4 B/lane/section) for
    decode latency (the device scan's per-step cost is fixed, so fewer,
    wider steps are faster — see PERF.md)."""
    target = 1
    while target * 2 <= min(cap, max(1, n_symbols // 16)):
        target *= 2
    return math.gcd(n_symbols, target)


class DeviceCdfTable:
    """Device-resident CDF table, laid out for the TPU's memory system.

    The decode scan's only table access is ONE contiguous 2-wide uint32
    gather per symbol — the advance word and the symbol value share one
    HBM transaction (av_flat[row, cum] = (adv, val)):

      adv[row, cum] = (cum - start(s)) | freq(s) << 16
      val[row, cum] = symbol + offset                  (in-range)
                    | ESC_FLAG | maxv << 16 | (offset + 2^15)  (escape)

    The encoder's per-(row, value) (start | freq<<16) pair table is kept for
    the vectorized (non-sequential) encode precompute."""

    def __init__(self, table: CdfTable):
        cdfs = np.asarray(table.cdfs, np.int64)          # [rows, cols]
        lengths = np.asarray(table.cdf_lengths, np.int64)
        offsets = np.asarray(table.offsets, np.int64)
        rows, cols = cdfs.shape
        self.cols = cols - 1  # pair-table row stride ((start, freq) per bin)

        starts = cdfs[:, :-1]
        freqs = cdfs[:, 1:] - cdfs[:, :-1]
        valid = np.arange(cols - 1)[None, :] < (lengths - 1)[:, None]
        pair = np.where(valid, starts | (np.maximum(freqs, 1) << 16), 1 << 16)
        self.pair_flat = jnp.asarray(pair.astype(np.uint32).reshape(-1))

        cum = np.arange(1 << PRECISION, dtype=np.int64)
        adv = np.empty((rows, 1 << PRECISION), np.uint32)
        val = np.empty((rows, 1 << PRECISION), np.int32)
        for r in range(rows):
            n = int(lengths[r])
            maxv = n - 2
            s = np.searchsorted(cdfs[r, :n], cum, side="right") - 1
            start = cdfs[r, s]
            freq = cdfs[r, s + 1] - start
            adv[r] = ((cum - start) | (freq << 16)).astype(np.uint32)
            symv = s + offsets[r]
            assert abs(offsets[r]) < (1 << 15) and maxv < (1 << 14)
            esc_entry = ESC_FLAG | (maxv << 16) | (offsets[r] + (1 << 15))
            val[r] = np.where(s == maxv, esc_entry, symv).astype(np.int32)
        # Interleaved (adv, val) pair table for the decode scan: one
        # contiguous 2-wide gather fetches BOTH per symbol (same HBM
        # transaction — measured on chip at bench geometry the pair-gather
        # scan is no slower than the adv-only scan, scripts/
        # epilogue_probe.py P6), which deletes the dense per-symbol val
        # gather from the decode epilogue entirely (~7 ms/section).
        self.av_flat = jnp.asarray(
            np.stack([adv.reshape(-1),
                      val.reshape(-1).view(np.uint32)], axis=-1))
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.maxv = jnp.asarray((lengths - 2).astype(np.int32))

    @property
    def adv_flat(self):
        """Advance halves (probe-script compatibility view; the decode
        path gathers from av_flat directly)."""
        return self.av_flat[:, 0]

    @property
    def val_flat(self):
        """Symbol-value halves as int32 (probe-script compatibility)."""
        import jax as _jax
        return _jax.lax.bitcast_convert_type(self.av_flat[:, 1], jnp.int32)


def _row_lookup(idx: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Gather-free per-element lookup into a tiny per-row table: TPU random
    gathers serialize per element (~8-25 ns each — ~100 ms per full symbol
    plane), but for a table with only `rows` entries a broadcast-compare +
    fused reduction is a few dozen VPU ops per element and never leaves the
    fused loop (same trick as GaussianConditional.build_indexes, PERF.md
    section 8b). Matches jnp.take(..., mode='clip') semantics."""
    rows = vec.shape[0]
    idx = jnp.clip(idx, 0, rows - 1)
    r = jnp.arange(rows, dtype=idx.dtype)
    return jnp.sum(jnp.where(idx[..., None] == r, vec, 0),
                   axis=-1, dtype=vec.dtype)


def _precompute(sym: jnp.ndarray, idx: jnp.ndarray, table: DeviceCdfTable):
    """Per-symbol escape handling + (start, freq) lookup, fully vectorized
    (the only sequential part of rANS is the state recurrence). The offset
    and maxv lookups are gather-free (_row_lookup); the (start, freq) pair
    gather is the one irreducible per-symbol table access."""
    off = _row_lookup(idx, table.offsets)
    maxv = _row_lookup(idx, table.maxv)
    value = sym - off
    esc = (value < 0) | (value >= maxv)
    raw = jnp.where(value < 0, -2 * value - 1,
                    2 * (value - maxv)).astype(jnp.uint32)
    value = jnp.where(esc, maxv, value)
    pair = jnp.take(table.pair_flat, idx * table.cols + value, mode="clip")
    start = pair & jnp.uint32(0xFFFF)
    freq = pair >> 16
    return start, freq, esc, raw


def coded_bits(sym: jnp.ndarray, idx: jnp.ndarray,
               table: DeviceCdfTable) -> jnp.ndarray:
    """Exact per-image rANS coding cost in bits (excluding the per-stream
    flush): -log2(freq/2^PRECISION) per coded symbol, plus the side-channel
    words escapes emit (16 bits tier-1, +32 bits tier-2). Replaces the
    Gaussian-likelihood estimate for pred_bpp reporting: this is the cost
    of the bytes actually written, not a continuous-model approximation.
    sym/idx [B, ...] -> [B] float32."""
    B = sym.shape[0]
    _, freq, esc, raw = _precompute(sym.reshape(B, -1), idx.reshape(B, -1),
                                    table)
    bits = PRECISION - jnp.log2(freq.astype(jnp.float32))
    extra = jnp.where(esc,
                      jnp.where(raw >= TIER1_MARKER, 48.0, 16.0), 0.0)
    return jnp.sum(bits + extra, axis=1)


CLIP_POISON = 1 << 20     # esc-count poison: tier-2 fired under clipped=True


def _encode_one(sym: jnp.ndarray, idx: jnp.ndarray, table: DeviceCdfTable,
                x0: jnp.ndarray, clipped: bool = False,
                escfree: bool = False):
    """Reverse-encode one section starting from lane states x0 [B, L].
    Returns (x_fin, vals [B, K], mask [B, K], n_esc [B]) where vals/mask
    hold the section's [renorm][tier-1][tier-2] words (no flush) and n_esc
    is the per-image escape count.

    clipped=True: caller guarantees |sym| <= 32000, so every escape zigzag
    fits one tier-1 word (raw <= ~64002 < TIER1_MARKER) and the tier-2 slots
    are omitted from vals/mask — the compaction scatter cost is per-UPDATE,
    and tier-2 was half of the worst-case capacity. The emitted stream is
    byte-identical (tier-2 never fires for such symbols); if the guarantee
    is violated, n_esc is poisoned with CLIP_POISON so the driver raises
    instead of writing a stream missing its tier-2 words.

    escfree=True (the speculative fast path): assume NO escape fires at
    all, so even the tier-1 slots are omitted — the compaction updates
    drop to ONE per symbol (the renorm slot), halving the scatter again
    vs clipped. Streams with zero escapes (every realistic low-bpp
    stream: the bench workload measures 0 escapes across the batch) are
    byte-identical; the per-image escape counts returned are exact, so
    the driver re-packs through the clipped executable whenever any
    image's count is nonzero. Implies the clipped layout otherwise."""
    B, n, L = sym.shape
    start, freq, esc, raw = _precompute(sym, idx, table)
    tr = lambda a: a.transpose(1, 0, 2)  # [n, B, L] scan layout
    xs_in = (tr(start).astype(jnp.uint32), tr(freq).astype(jnp.uint32))

    def body(x, inp):
        start, freq = inp
        renorm = x >= (freq << 16)
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(renorm, x >> 16, x)
        x = ((x1 // freq) << 16) | ((x1 % freq) + start)
        return x, (w, renorm)

    # reverse=True: symbols are encoded last-to-first (rANS requirement) and
    # the stacked outputs still land at their forward step index.
    x_fin, (w_main, m_main) = jax.lax.scan(body, x0, xs_in, reverse=True,
                                           unroll=scan_unroll())

    # side channel, (step, lane) order: tier-1 then tier-2
    big = esc & (raw >= TIER1_MARKER)
    esc_f = esc.reshape(B, -1)
    big_f = big.reshape(B, -1)
    raw_f = raw.reshape(B, -1)
    n_esc = jnp.sum(esc_f, axis=1, dtype=jnp.int32)
    if escfree:
        # no side-channel slots at all; exact n_esc lets the driver detect
        # the speculation miss and re-pack through the clipped executable
        return (x_fin, tr(w_main).reshape(B, -1),
                tr(m_main).reshape(B, -1), n_esc)
    if clipped:
        n_esc = n_esc + CLIP_POISON * jnp.any(big_f, axis=1).astype(jnp.int32)
        t1 = raw_f.astype(jnp.uint16)
        vals = jnp.concatenate([tr(w_main).reshape(B, -1), t1], axis=1)
        mask = jnp.concatenate([tr(m_main).reshape(B, -1), esc_f], axis=1)
        return x_fin, vals, mask, n_esc
    t1 = jnp.where(big_f, TIER1_MARKER, raw_f).astype(jnp.uint16)
    t2 = jnp.stack([(raw_f & jnp.uint32(0xFFFF)).astype(jnp.uint16),
                    (raw_f >> 16).astype(jnp.uint16)],
                   axis=-1).reshape(B, -1)
    m2 = jnp.repeat(big_f, 2, axis=1)

    vals = jnp.concatenate([tr(w_main).reshape(B, -1), t1, t2], axis=1)
    mask = jnp.concatenate([tr(m_main).reshape(B, -1), esc_f, m2], axis=1)
    return x_fin, vals, mask, n_esc


def encode_stream(sections, table: DeviceCdfTable, clipped: bool = False,
                  with_esc_counts: bool = False, escfree: bool = False):
    """Encode one multi-section stream with CHAINED lane states: sections is
    a list of (sym [B, n_i, L], idx [B, n_i, L]) in decode order, all with
    the same B and L. Lane states carry across sections (encoded in reverse
    section order), so the stream pays ONE 2L-word flush instead of one per
    section — at production lane counts the per-section flush was a ~5-20%
    rate tax at the reference's low-bpp operating points.

    clipped: see _encode_one — halves the compaction updates for |sym| <=
    32000 inputs (stream bytes unchanged). escfree: see _encode_one —
    halves them AGAIN for zero-escape streams (the speculative fast path;
    the exact esc counts let the caller detect a miss and re-pack).
    with_esc_counts: additionally return per-image per-section escape
    counts [B, n_sections] int32 (forward section order) — free here,
    ~100 ms of re-gathers if computed separately from the symbol planes.

    Layout: [2L flush][sec0 renorm|tier-1|tier-2][sec1 renorm|...]...
    Returns (vals [B, K], mask [B, K][, esc_counts]); pack with
    pack_streams()."""
    B, _, L = sections[0][0].shape
    x = jnp.full((B, L), RANS_L, jnp.uint32)
    blocks = []
    escs = []
    for sym, idx in reversed(sections):
        assert sym.shape[0] == B and sym.shape[2] == L, (
            "all sections of one stream must share (B, L)")
        x, vals, mask, n_esc = _encode_one(sym, idx, table, x,
                                           clipped=clipped, escfree=escfree)
        blocks.append((vals, mask))
        escs.append(n_esc)
    blocks.reverse()
    escs.reverse()
    flush = jnp.stack([(x & jnp.uint32(0xFFFF)).astype(jnp.uint16),
                       (x >> 16).astype(jnp.uint16)],
                      axis=-1).reshape(B, 2 * L)
    vals = jnp.concatenate([flush] + [v for v, _ in blocks], axis=1)
    mask = jnp.concatenate([jnp.ones((B, 2 * L), bool)]
                           + [m for _, m in blocks], axis=1)
    if with_esc_counts:
        return vals, mask, jnp.stack(escs, axis=1)
    return vals, mask


def encode_sections(sym: jnp.ndarray, idx: jnp.ndarray,
                    table: DeviceCdfTable, clipped: bool = False,
                    with_esc_counts: bool = False, escfree: bool = False):
    """Encode one single-section stream: sym/idx [B, n, L] int32 (equivalent
    to encode_stream with one section). Returns (vals [B, K] uint16, mask
    [B, K] bool[, esc_counts]); K = 2L + 4nL is the static worst case
    (2L + 2nL with clipped=True, 2L + nL with escfree=True)."""
    return encode_stream([(sym, idx)], table, clipped=clipped,
                         with_esc_counts=with_esc_counts, escfree=escfree)


def pack_streams(vals: jnp.ndarray, mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact per-image masked words into one flat buffer.

    vals/mask [B, K] (concatenate sections along axis 1 first). Returns
    (packed [B*K] uint16 — only the first sum(counts) entries meaningful —
    and counts [B] int32). One scatter; everything stays on device until the
    host slices off the real prefix."""
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
                   idx: jnp.ndarray, table: DeviceCdfTable,
                   sparse_esc: bool = False, tier2: bool = True,
                   escfree: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one section: idx [B, n, L] int32 -> symbols [B, n, L] int32.

    words: flat uint16 buffer (all images' streams back to back);
    img_base [B]: each image's stream start (in words);
    cursor [B]: per-image word offset (carries across sections of the same
    stream, e.g. consecutive ChARM slices);
    state: lane states [B, L] carried from the previous section of the SAME
    stream (chained format), or None for the stream's first section (reads
    the 2L flush words and advances the cursor past them);
    sparse_esc: resolve the escape side channel through a capped per-image
    escape table (esc_cap(n*L) entries) instead of three dense n*L-element
    gathers — exact whenever every image's section has at most esc_cap
    escapes, and poisons the cursor with ESC_POISON otherwise (the encoder
    flags such streams so the driver picks the dense variant up front);
    tier2=False: the stream is GUARANTEED tier-2-free (container header
    t2free bit — the codec's symbolizers clip to +-32000, so every escape
    zigzag fits one tier-1 word), which deletes the tier-2 resolution from
    the epilogue: 2 of the 3 dense n*L gathers and one full-plane cumsum in
    the dense variant. TPU random gathers serialize per element, so on
    escape-heavy streams this is most of the epilogue. A violated guarantee
    (a tier-1 word holding the 0xFFFF marker) poisons the cursor instead of
    decoding garbage.
    escfree=True: the stream is GUARANTEED to contain NO escapes at all
    (container config-byte bit 2 — certified per image by the encoder's
    exact escape counts), which deletes the ENTIRE escape epilogue: the
    full-plane escape cumsum, the rank->raw rebuild gather, and all
    side-channel word reads. A decoded escape entry under this guarantee
    poisons the cursor (corrupt or mis-certified stream).
    Returns (symbols, new_cursor, final lane states [B, L])."""
    B, n, L = idx.shape
    tidx_rows = idx * (1 << PRECISION)  # [B, n, L], add cum at runtime
    tr = lambda a: a.transpose(1, 0, 2)

    if state is None:
        # lane init: 2 little-endian words per lane, lanes ascending
        lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
        gidx = img_base[:, None] + cursor[:, None] + lane2
        low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
        high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
        x0 = low | (high << 16)
        cursor = cursor + 2 * L
    else:
        assert state.shape == (B, L), (state.shape, (B, L))
        x0 = state

    def body(carry, rows_t):
        x, cur = carry
        cum = x & jnp.uint32(0xFFFF)
        # the ONE random gather on the sequential critical path (an
        # optimization_barrier around it was A/B-tested: no effect —
        # scripts/rans_sidechannel_probe.py items 2/3). The 2-wide pair
        # gather fetches the advance word AND the symbol value in the same
        # HBM transaction (epilogue_probe.py P6: pair scan <= adv-only
        # scan), so no separate dense val gather is needed afterwards.
        both = jnp.take(table.av_flat, rows_t + cum.astype(jnp.int32),
                        axis=0, mode="clip")
        adv = both[..., 0]
        x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
        need = x < RANS_L
        pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
        widx = img_base[:, None] + cur[:, None] + pos - 1
        w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | w, x)
        return (x, cur + pos[:, -1]), both[..., 1]

    (x_fin, cursor), vals = jax.lax.scan(body, (x0, cursor), tr(tidx_rows),
                                         unroll=scan_unroll())

    # bitcast, not convert: val entries are int32 (symbol values can be
    # negative) carried through the scan as uint32 pair halves
    val = jax.lax.bitcast_convert_type(tr(vals), jnp.int32)   # [B, n, L]
    esc = val >= ESC_FLAG

    if escfree:
        # certified no-escape stream: symbols ARE the val entries; the only
        # epilogue work is the violation check (one fused compare+reduce)
        bad = jnp.any(esc.reshape(B, -1), axis=1)
        cursor = cursor + ESC_POISON * bad.astype(jnp.int32)
        return val, cursor, x_fin

    # side channel: tier-1 raws (1 word per escape, (step, lane) order),
    # then tier-2 full 32-bit raws for marked escapes
    esc_f = esc.reshape(B, -1)
    r1 = jnp.cumsum(esc_f, axis=1, dtype=jnp.int32)
    n_esc = r1[:, -1]
    if sparse_esc:
        # capped escape table: all side-channel work at [B, E] instead of
        # [B, n*L] (gathers serialize per element, so 3 dense n*L gathers
        # -> 3 small E gathers + ONE dense rank->raw mapping)
        E = esc_cap(n * L)
        e_ar = jnp.arange(E, dtype=jnp.int32)
        t1 = jnp.take(words,
                      img_base[:, None] + cursor[:, None] + e_ar[None, :],
                      mode="clip").astype(jnp.uint32)           # [B, E]
        valid = e_ar[None, :] < n_esc[:, None]
        big_e = valid & (t1 == TIER1_MARKER)
        if tier2:
            r2e = jnp.cumsum(big_e, axis=1, dtype=jnp.int32)
            n_big = r2e[:, -1]
            t2b = img_base[:, None] + (cursor + n_esc)[:, None]
            lo = jnp.take(words, t2b + 2 * r2e - 2,
                          mode="clip").astype(jnp.uint32)
            hi = jnp.take(words, t2b + 2 * r2e - 1,
                          mode="clip").astype(jnp.uint32)
            raw_e = jnp.where(big_e, lo | (hi << 16), t1).astype(jnp.int32)
            t2_words = 2 * n_big
        else:
            # guaranteed tier-2-free: a marker word means the guarantee was
            # violated — poison instead of decoding a garbage raw
            raw_e = t1.astype(jnp.int32)
            t2_words = ESC_POISON * jnp.any(big_e, axis=1).astype(jnp.int32)
        # dense rank -> raw mapping (the one remaining n*L-element gather),
        # as ONE flat take with folded row offsets: take_along_axis lowers
        # to a batched gather that measured ~30% slower than the plain
        # 1-D take at this shape (epilogue_probe.py P3 vs P3b)
        e_off = (jnp.arange(B, dtype=jnp.int32) * E)[:, None]
        raw = jnp.take(raw_e.reshape(-1),
                       e_off + jnp.clip(r1 - 1, 0, E - 1),
                       mode="clip").reshape(B, n, L)
        overflow = jnp.maximum(n_esc - E, 0)
        cursor = cursor + n_esc + t2_words \
            + jnp.where(overflow > 0, ESC_POISON, 0)
    else:
        w1 = jnp.take(words, img_base[:, None] + cursor[:, None] + r1 - 1,
                      mode="clip").astype(jnp.uint32)
        if tier2:
            big = esc_f & (w1 == TIER1_MARKER)
            r2 = jnp.cumsum(big, axis=1, dtype=jnp.int32)
            n_big = r2[:, -1]
            t2b = img_base[:, None] + (cursor + n_esc)[:, None]
            lo = jnp.take(words, t2b + 2 * r2 - 2,
                          mode="clip").astype(jnp.uint32)
            hi = jnp.take(words, t2b + 2 * r2 - 1,
                          mode="clip").astype(jnp.uint32)
            raw = jnp.where(big, lo | (hi << 16), w1).astype(jnp.int32)
            t2_words = 2 * n_big
        else:
            raw = w1.astype(jnp.int32)
            bad = esc_f & (w1 == TIER1_MARKER)
            t2_words = ESC_POISON * jnp.any(bad, axis=1).astype(jnp.int32)
        raw = raw.reshape(B, n, L)
        cursor = cursor + n_esc + t2_words

    off = (val & 0xFFFF) - (1 << 15)
    maxv = (val >> 16) & 0x3FFF
    esc_v = jnp.where(raw & 1 == 1, -(raw >> 1) - 1, (raw >> 1) + maxv) + off
    sym = jnp.where(esc, esc_v, val)
    return sym, cursor, x_fin
