"""Quantify the TPU-side cost structure of the device rANS decode.

PERF.md section 4 claims ~35-65 ns/element serialized random gathers and a
fixed ~87 us/step scan cost; this probe re-measures the three candidate
bottlenecks at the REAL flagship decode geometry (Kodak 768x512, batch 16,
y = 48x32x192 across 6 ChARM slices, lane cap 512):

  1. one big flat gather (val_flat-style: N indices into the 16 MB dense
     LUT, and into a small 64 KB table for comparison) - the out-of-scan
     symbol-value and escape-side-channel lookups;
  2. the full decode_section scan at one y-slice geometry (96 steps) and
     the per-step cost;
  3. the same scan with the table gather replaced by a dummy arithmetic
     advance (isolates gather vs scan-machinery cost).

Results feed the decision whether a gather-free decode (one-hot MXU
searchsorted) is worth building. Usage: python scripts/rans_gather_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=10, warmup=2):
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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dc_vic_tpu.codec.gaussian import GaussianConditional
    from dc_vic_tpu.ops import rans_device as rd

    rng = np.random.default_rng(0)
    B, L = 16, 512
    n_per_slice = 48 * 32 * 32          # one ChARM slice of the flagship y
    steps = n_per_slice // L            # 96

    table = rd.DeviceCdfTable(GaussianConditional().build_cdf_table())
    nrows = table.adv_flat.size >> 16
    print(f"table rows={nrows}, adv_flat={table.adv_flat.size*4/2**20:.1f} MB")

    # --- 1. big flat gathers
    N = B * 48 * 32 * 192               # all y symbols of the batch
    NBUF = 3
    idxs = [jnp.asarray(rng.integers(0, table.adv_flat.size, N, np.int32))
            for _ in range(NBUF)]
    take = jax.jit(lambda i: jnp.take(table.adv_flat, i, mode="clip"))
    dt = timeit(take, [(i,) for i in idxs])
    print(f"flat gather {N/1e6:.1f}M from 16MB LUT: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:.2f} ns/elem)")

    small = jnp.asarray(rng.integers(0, 1 << 30, 1 << 15, np.uint32))
    idxs_s = [jnp.asarray(rng.integers(0, small.size, N, np.int32))
              for _ in range(NBUF)]
    take_s = jax.jit(lambda i: jnp.take(small, i, mode="clip"))
    dt = timeit(take_s, [(i,) for i in idxs_s])
    print(f"flat gather {N/1e6:.1f}M from 128KB LUT: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:.2f} ns/elem)")

    # monotone gather (w1-style: indices nondecreasing)
    mono = [jnp.sort(i) for i in idxs_s]
    dt = timeit(take_s, [(i,) for i in mono])
    print(f"flat MONOTONE gather {N/1e6:.1f}M from 128KB: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:.2f} ns/elem)")

    # --- 2. real decode_section at one slice geometry
    sym = rng.integers(-6, 7, (B, steps, L)).astype(np.int32)
    idx_np = rng.integers(0, nrows, (B, steps, L)).astype(np.int32)
    symj, idxj = jnp.asarray(sym), jnp.asarray(idx_np)
    vals, mask = jax.jit(
        lambda s, i: rd.encode_sections(s, i, table))(symj, idxj)
    packed, counts = jax.jit(rd.pack_streams)(vals, mask)
    words = packed
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    def dec(words, base, idx):
        s, cur, fin = rd.decode_section(
            words, base, jnp.zeros((B,), jnp.int32), None, idx, table)
        return s[0, 0, 0] + cur[0] + fin[0, 0]

    jd = jax.jit(dec)
    out = jax.jit(lambda w, b, i: rd.decode_section(
        w, b, jnp.zeros((B,), jnp.int32), None, i, table)[0])(
        words, base, idxj)
    assert np.array_equal(np.asarray(out), sym), "decode mismatch!"
    dt = timeit(jd, [(words, base, idxj)])
    print(f"decode_section {steps} steps x {B}x{L}: {dt*1e3:7.2f} ms "
          f"({dt/steps*1e6:.1f} us/step) [correctness verified]")

    # --- 3. scan machinery with the table gather stubbed out
    def dec_nogather(words, base, idx):
        tidx_rows = idx * (1 << 16)
        tr = lambda a: a.transpose(1, 0, 2)
        lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
        gidx = base[:, None] + lane2
        low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
        high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
        x0 = low | (high << 16)
        cursor = jnp.full((B,), 2 * L, jnp.int32)

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            # dummy advance: same op mix, no table access
            adv = (rows_t.astype(jnp.uint32) ^ cum) | jnp.uint32(1 << 16)
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            widx = base[:, None] + cur[:, None] + pos - 1
            w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(
            body, (x0, cursor), tr(tidx_rows))
        return cums[0, 0, 0].astype(jnp.int32) + x_fin[0, 0].astype(jnp.int32)

    jng = jax.jit(dec_nogather)
    dt = timeit(jng, [(words, base, idxj)])
    print(f"scan, TABLE gather stubbed (word gather kept): {dt*1e3:7.2f} ms "
          f"({dt/steps*1e6:.1f} us/step)")

    # (scan unroll=2/4/8 was measured at 433-437 us/step — no effect — and
    # the knob was dropped from decode_section.)

    # --- 2c. optimization_barrier around the in-scan gather. CAUTION on
    # interpreting 2c/2d: these are SCAN-ONLY functions, while item 2 above
    # times the full decode_section (scan + the out-of-scan val/side-channel
    # epilogue). The right comparison is scripts/rans_sidechannel_probe.py,
    # which shows the barrier itself has NO effect (15.88 vs 15.87 ms) and
    # the scan/epilogue split is ~16/29 ms — the epilogue's three dense
    # 786k-element escape gathers are the real cost, not in-scan fusion.
    def dec_barrier(words, base, idx):
        tidx_rows = idx * (1 << 16)
        tr = lambda a: a.transpose(1, 0, 2)
        lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
        gidx = base[:, None] + lane2
        low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
        high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
        x0 = low | (high << 16)
        cursor = jnp.full((B,), 2 * L, jnp.int32)

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            tix = jax.lax.optimization_barrier(
                rows_t + cum.astype(jnp.int32))
            adv = jnp.take(table.adv_flat, tix, mode="clip")
            adv = jax.lax.optimization_barrier(adv)
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            widx = base[:, None] + cur[:, None] + pos - 1
            w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(
            body, (x0, cursor), tr(tidx_rows))
        return cums[0, 0, 0].astype(jnp.int32) + x_fin[0, 0].astype(jnp.int32)

    dt = timeit(jax.jit(dec_barrier), [(words, base, idxj)])
    print(f"scan, barrier-isolated TABLE gather:           {dt*1e3:7.2f} ms "
          f"({dt/steps*1e6:.1f} us/step)")

    # --- 2d. barrier around the WORD gather too
    def dec_barrier2(words, base, idx):
        tidx_rows = idx * (1 << 16)
        tr = lambda a: a.transpose(1, 0, 2)
        lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
        gidx = base[:, None] + lane2
        low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
        high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
        x0 = low | (high << 16)
        cursor = jnp.full((B,), 2 * L, jnp.int32)

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            tix = jax.lax.optimization_barrier(
                rows_t + cum.astype(jnp.int32))
            adv = jnp.take(table.adv_flat, tix, mode="clip")
            adv = jax.lax.optimization_barrier(adv)
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            widx = jax.lax.optimization_barrier(
                base[:, None] + cur[:, None] + pos - 1)
            w = jax.lax.optimization_barrier(
                jnp.take(words, widx, mode="clip")).astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(
            body, (x0, cursor), tr(tidx_rows))
        return cums[0, 0, 0].astype(jnp.int32) + x_fin[0, 0].astype(jnp.int32)

    dt = timeit(jax.jit(dec_barrier2), [(words, base, idxj)])
    print(f"scan, barriers on BOTH gathers:                {dt*1e3:7.2f} ms "
          f"({dt/steps*1e6:.1f} us/step)")

    # --- 4. scan with BOTH gathers stubbed
    def dec_pure(words, base, idx):
        tidx_rows = idx * (1 << 16)
        tr = lambda a: a.transpose(1, 0, 2)
        x0 = jnp.full((B, L), 1 << 16, jnp.uint32)

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            adv = (rows_t.astype(jnp.uint32) ^ cum) | jnp.uint32(1 << 16)
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            w = (pos - 1).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(
            body, (x0, jnp.zeros((B,), jnp.int32)), tr(tidx_rows))
        return cums[0, 0, 0].astype(jnp.int32) + x_fin[0, 0].astype(jnp.int32)

    jp = jax.jit(dec_pure)
    dt = timeit(jp, [(words, base, idxj)])
    print(f"scan, BOTH gathers stubbed (pure vector):     {dt*1e3:7.2f} ms "
          f"({dt/steps*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
