"""Decode-scan lane-width sweep + renorm prefix-sum decomposition.

The device rANS decode scan's per-step cost was measured width-insensitive
up to [16,512] lanes (PERF.md section 4: ~87-116 us/step), which makes lane
count a latency dial: steps per section = n_symbols / L, so doubling L
halves the serialized step count at a rate cost of 4 bytes/lane/stream
(the chained flush). The shipped throughput mode caps at 512; this probe
measures whether the width-insensitivity extends to 1024/2048/4096 lanes at
the real bench geometry (B=16, 6 ChARM sections of 48x32x32 symbols), i.e.
whether a wider cap is free throughput.

Also decomposes the non-gather scan overhead at L=512:
  scanA: shipping body (pair gather + renorm word gather + lane cumsum)
  scanC: cumsum replaced by an explicit log2(L)-pass shifted-add prefix sum
         (identical result; A/Bs XLA's cumsum lowering inside the scan)
  scanD: per-lane independent word cursors (NO cross-lane prefix sum; fake
         word layout, timing-only — bounds what a per-lane-substream stream
         format could save)

Symbols are drawn in-range per CDF row (~0.5% escapes) so the sparse-escape
full path stays exact; inputs rotate across 3 distinct buffers per timing
loop (this environment value-caches identical executions, PERF.md sec 5).

Usage (real chip): python scripts/lane_sweep_probe.py [--lanes 512,1024,...]
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=9, warmup=2):
    import jax
    out = None
    for a in arg_sets:
        out = fn(*a)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*arg_sets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="512,1024,2048,4096")
    ap.add_argument("--decomp", action="store_true",
                    help="run the scanA/C/D decomposition at the first L")
    ap.add_argument("--iters", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.codec.gaussian import GaussianConditional, get_scale_table
    from dc_vic_tpu.ops import rans_device as rd
    from dc_vic_tpu.ops.rans_device import (DeviceCdfTable, decode_section,
                                            encode_stream, pack_streams)

    B, yH, yW, sc, ns = 16, 48, 32, 32, 6
    ny = yH * yW * sc                     # 49152 symbols / section / image
    table = DeviceCdfTable(
        GaussianConditional(scale_bound=0.11).build_cdf_table(
            get_scale_table()))
    rows = int(table.offsets.shape[0])
    offs = np.asarray(table.offsets)
    maxv = np.asarray(table.maxv)

    def make_sections(seed, L):
        n = ny // L
        rng = np.random.default_rng(seed)
        secs = []
        for _ in range(ns):
            idx = rng.integers(0, rows, (B, n, L))
            # in-range symbol for its row, ~0.5% escapes (realistic streams
            # sit well under the esc_cap = n*L/8 sparse-epilogue bound)
            v = rng.integers(0, 1 << 30, (B, n, L)) % np.maximum(maxv[idx], 1)
            esc = rng.random((B, n, L)) < 0.005
            v = np.where(esc, maxv[idx] + rng.integers(1, 30, (B, n, L)), v)
            secs.append((jnp.asarray(v + offs[idx], jnp.int32),
                         jnp.asarray(idx, jnp.int32)))
        return secs

    def full_decoder(L):
        n = ny // L

        def f(words, bb, idxs):
            cursor = jnp.zeros((B,), jnp.int32)
            state = None
            outs = []
            for i in range(ns):
                sym, cursor, state = decode_section(
                    words, bb, cursor, state, idxs[i], table,
                    sparse_esc=True)
                outs.append(sym)
            return jnp.stack(outs), cursor
        return jax.jit(f)

    lane_list = [int(x) for x in args.lanes.split(",")]
    enc = jax.jit(lambda s: encode_stream(list(s), table))
    jpack = jax.jit(pack_streams)

    results = {}
    for L in lane_list:
        if ny % L:
            print(f"L={L}: does not divide {ny}, skipped", flush=True)
            continue
        n = ny // L
        arg_sets = []
        ref_syms = []
        for seed in range(3):
            secs = make_sections(seed, L)
            vals, mask = enc(secs)
            packed, counts = jpack(vals, mask)
            base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    jnp.cumsum(counts)[:-1].astype(jnp.int32)])
            arg_sets.append((packed, base, [i for _, i in secs]))
            ref_syms.append(secs)
            if seed == 0:
                words_total = int(np.asarray(counts).sum())
                flush_frac = 2 * L * B / max(words_total, 1)
        jf = full_decoder(L)
        out = jf(*arg_sets[0])
        for i in range(ns):
            assert np.array_equal(np.asarray(out[0][i]),
                                  np.asarray(ref_syms[0][i][0])), \
                f"decode mismatch at L={L} section {i}"
        t = timeit(jf, arg_sets, iters=args.iters)
        results[L] = t
        print(f"L={L:5d} steps/sec={n:4d} full 6-section decode: "
              f"{t*1e3:8.1f} ms   ({t/(ns*n)*1e6:6.1f} us/step, "
              f"flush {flush_frac*100:4.1f}% of stream, "
              f"{4*L/1024:.0f} KiB/img)", flush=True)

    if not args.decomp:
        return

    # ---- scan-body decomposition at the first lane width
    L = lane_list[0]
    n = ny // L
    secs = make_sections(0, L)
    vals, mask = enc(secs)
    packed, counts = jpack(vals, mask)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    idx_list = [i for _, i in secs]

    def scan_only(mode):
        def f(words, bb, idxs):
            cursor = jnp.zeros((B,), jnp.int32)
            lane_cur = jnp.zeros((B, L), jnp.int32)   # scanD only
            x = None
            acc = jnp.zeros((B,), jnp.uint32)
            for i in range(ns):
                tidx_rows = idxs[i] * (1 << 16)
                tr = lambda a: a.transpose(1, 0, 2)
                if x is None:
                    lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
                    gidx = bb[:, None] + cursor[:, None] + lane2
                    low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
                    high = jnp.take(words, gidx + 1,
                                    mode="clip").astype(jnp.uint32)
                    x = low | (high << 16)
                    cursor = cursor + 2 * L

                def body(carry, rows_t):
                    x, cur, lcur = carry
                    cum = x & jnp.uint32(0xFFFF)
                    adv = jnp.take(table.adv_flat,
                                   rows_t + cum.astype(jnp.int32),
                                   mode="clip")
                    x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
                    need = x < rd.RANS_L
                    if mode == "D":
                        # per-lane cursors: no cross-lane prefix sum at all
                        # (word positions are WRONG — timing bound only)
                        widx = bb[:, None] + lcur + jnp.arange(
                            L, dtype=jnp.int32)[None, :]
                        w = jnp.take(words, widx, mode="clip").astype(
                            jnp.uint32)
                        lcur = lcur + need.astype(jnp.int32)
                        pos_last = jnp.sum(need, axis=1, dtype=jnp.int32)
                    elif mode == "C":
                        # explicit log2(L) shifted-add prefix sum
                        pos = need.astype(jnp.int32)
                        shift = 1
                        while shift < L:
                            pos = pos + jnp.pad(
                                pos, ((0, 0), (shift, 0)))[:, :L]
                            shift *= 2
                        widx = bb[:, None] + cur[:, None] + pos - 1
                        w = jnp.take(words, widx, mode="clip").astype(
                            jnp.uint32)
                        pos_last = pos[:, -1]
                    else:   # "A" — shipping body
                        pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
                        widx = bb[:, None] + cur[:, None] + pos - 1
                        w = jnp.take(words, widx, mode="clip").astype(
                            jnp.uint32)
                        pos_last = pos[:, -1]
                    x = jnp.where(need, (x << 16) | w, x)
                    return (x, cur + pos_last, lcur), cum.astype(jnp.uint16)

                (x, cursor, lane_cur), cums = jax.lax.scan(
                    body, (x, cursor, lane_cur), tr(tidx_rows),
                    unroll=rd.scan_unroll())
                acc = acc + jnp.sum(cums.astype(jnp.uint32), axis=(0, 2))
            return acc, cursor
        return jax.jit(f)

    ja = scan_only("A")
    jc = scan_only("C")
    jd = scan_only("D")
    ra, rc = ja(packed, base, idx_list), jc(packed, base, idx_list)
    assert np.array_equal(np.asarray(ra[0]), np.asarray(rc[0]))
    assert np.array_equal(np.asarray(ra[1]), np.asarray(rc[1]))
    for name, j in (("A cumsum (shipping)", ja),
                    ("C log-shift prefix ", jc),
                    ("D per-lane cursors ", jd)):
        t = timeit(j, [(packed, base, idx_list)], iters=args.iters)
        print(f"scan-only {name} at L={L}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
