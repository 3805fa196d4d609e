"""Decompose decode_section's epilogue cost at bench geometry.

scan_window_probe.py measured the scan (adv chain + renorm) at ~15 ms per
section while the full decode_section runs ~40 ms per section — the
epilogue (symbol-value gather + escape side-channel resolution) is ~60% of
the y decode. This times each epilogue constituent standalone at the exact
shipping shapes to find where those milliseconds live:

  P1: val gather          take(val_flat[16 MB], idx*2^16+cum)   [B, N]
  P2: r1 cumsum           cumsum(esc, axis=1)                   [B, N]
  P3: rank->raw mapping   take_along_axis(raw_e [B, E], r1-1)   [B, N]
  P4: side-channel reads  3 gathers at [B, E]
  P5: escape arithmetic   wheres/zigzag                         [B, N]
  F : full decode_section (sparse)  — the shipping path
  S : scan only                     — from scan_window_probe

Usage (real chip): PROBE_SECTIONS=2 python scripts/epilogue_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=8, warmup=2):
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.codec.gaussian import GaussianConditional, get_scale_table
    from dc_vic_tpu.ops.rans_device import (DeviceCdfTable, decode_section,
                                            encode_stream, esc_cap,
                                            pack_streams, section_lanes)

    B, yH, yW, sc = 16, 48, 32, 32
    ns = int(os.environ.get("PROBE_SECTIONS", "2"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    ny = yH * yW * sc
    L = section_lanes(ny, lanes)
    n = ny // L
    N = n * L
    E = esc_cap(N)
    print(f"geometry: B={B} sections={ns} n={n} L={L} N={N} E={E}",
          flush=True)

    table = DeviceCdfTable(
        GaussianConditional(scale_bound=0.11).build_cdf_table(
            get_scale_table()))
    rows = table.adv_flat.size >> 16
    rng = np.random.default_rng(0)

    NBUF = 2
    mk = lambda lo, hi, shape, dt=jnp.int32: [
        jnp.asarray(rng.integers(lo, hi, shape), dt) for _ in range(NBUF)]
    tidx = mk(0, rows << 16, (B, N))
    cums = mk(0, 1 << 16, (B, N))
    esc = [jnp.asarray(rng.random((B, N)) < 0.1) for _ in range(NBUF)]
    raw_e = mk(0, 1 << 15, (B, E), jnp.int32)
    r1 = [jnp.cumsum(e, axis=1, dtype=jnp.int32) for e in esc]
    words = mk(0, 1 << 16, (2_000_000,), jnp.int32)
    words = [w.astype(jnp.uint16) for w in words]
    basec = mk(0, 1000, (B,), jnp.int32)

    def rep(f):
        # chain ns copies with a value dependency so nothing is elided
        def g(*bufs):
            out = None
            for i in range(ns):
                r = f(*bufs, i)
                out = r if out is None else out + r
            return out
        return jax.jit(g)

    # P1: the dense val gather (16 MB table)
    p1 = rep(lambda t, c, i: jnp.sum(jnp.take(
        table.val_flat, t + c + i, mode="clip"), axis=1))
    t = timeit(p1, list(zip(tidx, cums)))
    print(f"P1 val gather x{ns}:          {t*1e3:8.1f} ms", flush=True)

    # P2: the escape-rank cumsum
    p2 = rep(lambda e, i: jnp.cumsum(
        e ^ (i % 2 == 1), axis=1, dtype=jnp.int32)[:, -1])
    t = timeit(p2, [(e,) for e in esc])
    print(f"P2 esc cumsum x{ns}:          {t*1e3:8.1f} ms", flush=True)

    # P3: the dense rank->raw mapping out of the small escape table
    p3 = rep(lambda re_, r1_, i: jnp.sum(jnp.take_along_axis(
        re_ + i, jnp.clip(r1_ - 1, 0, E - 1), axis=1), axis=1))
    t = timeit(p3, list(zip(raw_e, r1)))
    print(f"P3 rank->raw map x{ns}:       {t*1e3:8.1f} ms", flush=True)

    # P3b: the same mapping as ONE flat 1-D gather (row-offset fold) —
    # take_along_axis lowers to a batched gather that underperforms the
    # plain flat take even against a 16 MB table (P1)
    e_off = jnp.arange(B, dtype=jnp.int32)[:, None] * E
    p3b = rep(lambda re_, r1_, i: jnp.sum(jnp.take(
        (re_ + i).reshape(-1), e_off + jnp.clip(r1_ - 1, 0, E - 1),
        mode="clip"), axis=1))
    t = timeit(p3b, list(zip(raw_e, r1)))
    print(f"P3b rank->raw FLAT take x{ns}: {t*1e3:8.1f} ms", flush=True)

    # P1b: val gather against a uint16 table (8 MB instead of 16)
    val16 = (table.val_flat & 0xFFFF).astype(jnp.uint16)
    p1b = rep(lambda t_, c, i: jnp.sum(jnp.take(
        val16, t_ + c + i, mode="clip").astype(jnp.int32), axis=1))
    t = timeit(p1b, list(zip(tidx, cums)))
    print(f"P1b val gather uint16 x{ns}:  {t*1e3:8.1f} ms", flush=True)

    # P4: the three [B, E] side-channel reads
    def side(w, bb, i):
        e_ar = jnp.arange(E, dtype=jnp.int32)
        t1 = jnp.take(w, bb[:, None] + i + e_ar[None, :],
                      mode="clip").astype(jnp.uint32)
        lo = jnp.take(w, bb[:, None] + 2 * e_ar[None, :] + i,
                      mode="clip").astype(jnp.uint32)
        hi = jnp.take(w, bb[:, None] + 2 * e_ar[None, :] + 1 + i,
                      mode="clip").astype(jnp.uint32)
        return jnp.sum(t1 + lo + hi, axis=1)
    p4 = rep(side)
    t = timeit(p4, list(zip(words, basec)))
    print(f"P4 side-channel [B,E] x{ns}:  {t*1e3:8.1f} ms", flush=True)

    # P6: pair-gather — fetch (adv, val) as ONE contiguous 2-wide gather
    # inside the scan, so the dense val epilogue gather disappears. If the
    # slice-2 gather costs ~the same HBM transaction as the slice-1 gather,
    # this removes one full per-symbol gather from the decode.
    import jax.lax as lax
    av = jnp.stack([table.adv_flat,
                    table.val_flat.astype(jnp.uint32)], axis=-1)  # [M, 2]
    Lw = L

    def scan_pair(pair: bool):
        def f(tidx3, x0):
            def body(carry, rows_t):
                x, acc = carry
                cum = x & jnp.uint32(0xFFFF)
                gi = rows_t + cum.astype(jnp.int32)
                if pair:
                    both = jnp.take(av, gi, axis=0, mode="clip")
                    adv = both[..., 0]
                    val = both[..., 1]
                else:
                    adv = jnp.take(table.adv_flat, gi, mode="clip")
                    val = jnp.zeros_like(adv)
                x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
                x = jnp.maximum(x, jnp.uint32(1 << 16))  # keep state sane
                return (x, acc + val), cum.astype(jnp.uint16)

            (xf, acc), cums = jax.lax.scan(
                body, (x0, jnp.zeros_like(x0)), tidx3, unroll=4)
            return xf, acc, jnp.sum(cums.astype(jnp.uint32), axis=0)
        return jax.jit(f)

    tidx3 = [t.reshape(B, n, Lw).transpose(1, 0, 2) for t in tidx]
    x0 = jnp.full((B, Lw), 1 << 16, jnp.uint32)
    for name, jp in (("single", scan_pair(False)), ("pair", scan_pair(True))):
        out = jp(tidx3[0], x0)
        jax.block_until_ready(out)
        t = timeit(jp, [(t3, x0) for t3 in tidx3], iters=8)
        print(f"P6 scan adv-{name} gather x1: {t*1e3:8.1f} ms", flush=True)

    # F: the shipping decode_section chain (sparse), real streams
    secs = [(jnp.asarray(rng.integers(-6, 7, (B, n, L)), jnp.int32),
             jnp.asarray(rng.integers(0, rows, (B, n, L)), jnp.int32))
            for _ in range(ns)]
    vals, mask = jax.jit(lambda s: encode_stream(list(s), table))(secs)
    packed, counts = jax.jit(pack_streams)(vals, mask)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    idx_list = [i for _, i in secs]

    def f(wordsv, bb, idxs):
        cursor = jnp.zeros((B,), jnp.int32)
        state = None
        outs = []
        for i in range(ns):
            sym, cursor, state = decode_section(
                wordsv, bb, cursor, state, idxs[i], table, sparse_esc=True)
            outs.append(jnp.sum(sym, axis=(1, 2)))
        return jnp.stack(outs), cursor
    jf = jax.jit(f)
    out = jf(packed, base, idx_list)
    t = timeit(jf, [(packed, base, idx_list)])
    print(f"F  decode_section x{ns}:      {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
