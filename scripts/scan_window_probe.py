"""Decode-scan micro-optimizations, measured at bench geometry.

The y rANS decode (6 sections) costs ~239 ms; the round-3 floor probe
(scan_floor_probe.py) showed the bare adv-gather chain is ~67 ms and adding
the renorm word gather + lane cumsum brings it to ~110 ms. The renorm word
fetch is a RANDOM gather today, but its access pattern is sequential: words
are consumed in (step, lane) order, so each step reads at most L contiguous
words starting at the per-image cursor. This probe A/Bs:

  scan A (current): w = words[img_base + cur + pos - 1]   (random gather)
  scan B (window):  win = contiguous L-window at img_base+cur (per-image
                    dynamic slice); w = take_along_axis(win, pos-1)
                    (tiny in-window gather — source fits VMEM)

and the epilogue decomposition of decode_section:

  E0: scan only            E1: + val gather (dense, 16 MB table)
  E2: + escape resolution (sparse path)     = the shipping decode_section

Numbers decide whether to land the window variant in ops/rans_device.py
(symbols are identical either way — integer program, pinned by equality
checks here).

Usage (real chip): python scripts/scan_window_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=6, warmup=2):
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
    from dc_vic_tpu.ops import rans_device as rd
    from dc_vic_tpu.ops.rans_device import (DeviceCdfTable, decode_section,
                                            encode_stream, pack_streams,
                                            section_lanes)

    B, yH, yW, sc, ns = 16, 48, 32, 32, int(os.environ.get("PROBE_SECTIONS", "6"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    ny = yH * yW * sc
    L = section_lanes(ny, lanes)
    n = ny // L
    print(f"geometry: B={B} sections={ns} n={n} L={L}", flush=True)

    table = DeviceCdfTable(
        GaussianConditional(scale_bound=0.11).build_cdf_table(
            get_scale_table()))
    rows = table.adv_flat.size >> 16
    offs = np.asarray(table.offsets)
    maxv = np.asarray(table.maxv)
    rng = np.random.default_rng(0)
    # in-range symbols for each drawn CDF row, ~0.5% escapes: uniform
    # [-6, 7) symbols against random rows escape on most small-scale rows,
    # overflowing the sparse-epilogue escape cap (esc_cap = nL/8) — which
    # poisons the decode cursor by design and fails the equality check.
    secs = []
    for _ in range(ns):
        idx = rng.integers(0, rows, (B, n, L))
        v = rng.integers(0, 1 << 30, (B, n, L)) % np.maximum(maxv[idx], 1)
        esc = rng.random((B, n, L)) < 0.005
        v = np.where(esc, maxv[idx] + rng.integers(1, 30, (B, n, L)), v)
        secs.append((jnp.asarray(v + offs[idx], jnp.int32),
                     jnp.asarray(idx, jnp.int32)))
    vals, mask = jax.jit(lambda s: encode_stream(list(s), table))(secs)
    packed, counts = jax.jit(pack_streams)(vals, mask)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    idx_list = [i for _, i in secs]

    # ---- full decode_section chain (shipping path), sparse + dense esc
    def full(sparse):
        def f(words, bb, idxs):
            cursor = jnp.zeros((B,), jnp.int32)
            state = None
            outs = []
            for i in range(ns):
                sym, cursor, state = decode_section(
                    words, bb, cursor, state, idxs[i], table,
                    sparse_esc=sparse)
                outs.append(sym)
            return jnp.stack(outs), cursor
        return jax.jit(f)

    if os.environ.get("PROBE_FULL", "1") != "1":
        jfull = None
    else:
        jfull = full(True)
    t_full = None
    if jfull is not None:
        out = jfull(packed, base, idx_list)
        for i in range(ns):
            assert np.array_equal(np.asarray(out[0][i]),
                                  np.asarray(secs[i][0]))
        t_full = timeit(jfull, [(packed, base, idx_list)])
        print(f"decode_section x{ns} (sparse esc):      {t_full*1e3:8.1f} ms",
              flush=True)

    # ---- scan-only variants (no val epilogue): A = shipping gather,
    #      B = contiguous window + in-window select
    def scan_only(window: bool):
        def f(words, bb, idxs):
            cursor = jnp.zeros((B,), jnp.int32)
            x = None
            acc = jnp.zeros((B,), jnp.uint32)
            for i in range(ns):
                idx = idxs[i]
                tidx_rows = idx * (1 << 16)
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
                    x, cur = carry
                    cum = x & jnp.uint32(0xFFFF)
                    adv = jnp.take(table.adv_flat,
                                   rows_t + cum.astype(jnp.int32),
                                   mode="clip")
                    x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
                    need = x < rd.RANS_L
                    pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
                    if window:
                        # contiguous L-window per image, then tiny select
                        starts = bb + cur
                        win = jax.vmap(
                            lambda s: jax.lax.dynamic_slice(words, (s,),
                                                            (L,)))(starts)
                        w = jnp.take_along_axis(
                            win, jnp.clip(pos - 1, 0, L - 1),
                            axis=1).astype(jnp.uint32)
                    else:
                        widx = bb[:, None] + cur[:, None] + pos - 1
                        w = jnp.take(words, widx, mode="clip").astype(
                            jnp.uint32)
                    x = jnp.where(need, (x << 16) | w, x)
                    return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

                (x, cursor), cums = jax.lax.scan(
                    body, (x, cursor), tr(tidx_rows),
                    unroll=rd.scan_unroll())
                acc = acc + jnp.sum(cums.astype(jnp.uint32), axis=(0, 2))
            return acc, cursor
        return jax.jit(f)

    ja = scan_only(False)
    jb = scan_only(True)
    ra = ja(packed, base, idx_list)
    rb = jb(packed, base, idx_list)
    assert np.array_equal(np.asarray(ra[0]), np.asarray(rb[0])), \
        "window variant decodes different cums"
    assert np.array_equal(np.asarray(ra[1]), np.asarray(rb[1]))
    t_a = timeit(ja, [(packed, base, idx_list)])
    t_b = timeit(jb, [(packed, base, idx_list)])
    print(f"scan-only, renorm RANDOM gather (A):    {t_a*1e3:8.1f} ms",
          flush=True)
    print(f"scan-only, renorm WINDOW slice (B):     {t_b*1e3:8.1f} ms",
          flush=True)
    if t_full is not None:
        print(f"epilogues (full - scanA):               "
              f"{(t_full-t_a)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
