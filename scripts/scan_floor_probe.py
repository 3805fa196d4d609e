"""Latency floor for the device rANS decode scan.

The y-scan costs ~240 ms at bench geometry (576 steps x [16,512] lanes,
one state-dependent adv-table gather per symbol + a data-dependent renorm
word gather). Any rANS decode implementation must pay at least the
dependent-chain gather: x_{t+1} = f(table[g(x_t)]). This probe measures
that floor in isolation, at the same shapes and table size, so the
headroom for a hand-written (Pallas) scan kernel is known before writing
one:

  A. chained adv gather only (no renorm) — the irreducible recurrence
  B. + the renorm word gather (the second in-scan gather)
  C. the real decode_section at the same geometry, for reference

Usage (real chip): python scripts/scan_floor_probe.py
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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(os.path.dirname(__file__),
                                                  "..", ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B, L, steps, sections = 16, 512, 96, 6
    rows = 64
    rng = np.random.default_rng(0)
    # same size/layout as DeviceCdfTable.adv_flat for the y table
    table = jnp.asarray(
        rng.integers(0, 1 << 32, rows << 16, dtype=np.uint64)
        .astype(np.uint32))
    rows_t = jnp.asarray(
        rng.integers(0, rows, (sections * steps, B, L)).astype(np.int32)
        << 16)
    words = jnp.asarray(rng.integers(0, 1 << 16, 4 << 20,
                                     dtype=np.int64).astype(np.uint16))
    x0 = jnp.full((B, L), 1 << 16, jnp.uint32)

    def probe_a(x0, rows_t):
        def body(x, rt):
            adv = jnp.take(table, rt + (x & jnp.uint32(0xFFFF))
                           .astype(jnp.int32), mode="clip")
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            x = jnp.maximum(x, jnp.uint32(1 << 16))  # keep state sane
            return x, (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        return jax.lax.scan(body, x0, rows_t)

    ja = jax.jit(probe_a)
    dt = timeit(ja, [(x0, rows_t)])
    n_sym = sections * steps * B * L
    print(f"A chained adv gather only : {dt*1e3:8.2f} ms "
          f"({dt/ (sections*steps) * 1e6:6.1f} us/step, "
          f"{dt / n_sym * 1e9:5.1f} ns/sym)", flush=True)

    # A' table-size sweep: does the gather floor scale with LUT size? A
    # 12-bit-precision CDF (1 MB table) would fit VMEM/benefit caches IF
    # the hardware rewards it — this measures that without building it.
    for prec in (14, 12, 10):
        tbl = jnp.asarray(
            rng.integers(0, 1 << 32, rows << prec, dtype=np.uint64)
            .astype(np.uint32))
        rt_small = jnp.asarray(
            (rng.integers(0, rows, (sections * steps, B, L))
             .astype(np.int32)) << prec)
        mask = jnp.uint32((1 << prec) - 1)

        def probe_prec(x0, rt, tbl=tbl, mask=mask, prec=prec):
            def body(x, r):
                adv = jnp.take(tbl, r + (x & mask).astype(jnp.int32),
                               mode="clip")
                x = (adv >> 16) * (x >> prec) + (adv & mask)
                x = jnp.maximum(x, jnp.uint32(1 << 16))
                return x, (x & mask).astype(jnp.uint16)
            return jax.lax.scan(body, x0, rt)

        jp = jax.jit(probe_prec)
        dt = timeit(jp, [(x0, rt_small)])
        print(f"A' prec={prec} ({(rows << prec) * 4 / 1e6:5.1f} MB table)"
              f" : {dt*1e3:8.2f} ms ({dt/(sections*steps)*1e6:6.1f} us/step,"
              f" {dt / n_sym * 1e9:5.1f} ns/sym)", flush=True)

    def probe_b(x0, rows_t):
        def body(carry, rt):
            x, cur = carry
            adv = jnp.take(table, rt + (x & jnp.uint32(0xFFFF))
                           .astype(jnp.int32), mode="clip")
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            w = jnp.take(words, cur[:, None] + pos - 1,
                         mode="clip").astype(jnp.uint32)
            x = jnp.where(need, jnp.maximum((x << 16) | w,
                                            jnp.uint32(1 << 16)), x)
            return (x, cur + pos[:, -1]), (x & jnp.uint32(0xFFFF)
                                           ).astype(jnp.uint16)
        cur0 = jnp.zeros((B,), jnp.int32)
        return jax.lax.scan(body, (x0, cur0), rows_t)

    jb = jax.jit(probe_b)
    dt = timeit(jb, [(x0, rows_t)])
    print(f"B + renorm word gather    : {dt*1e3:8.2f} ms "
          f"({dt/(sections*steps)*1e6:6.1f} us/step)", flush=True)

    # C: the real thing at identical geometry (from scan_attn_ab.py: ~239 ms)
    print("C real y-scan reference   : see scan_attn_ab.py (~239 ms)",
          flush=True)


if __name__ == "__main__":
    main()
