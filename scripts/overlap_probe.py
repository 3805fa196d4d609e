"""Does the tunnel link actually overlap device compute?

VERDICT r3 #2: BENCH_r03's median cycle (2.38 s) is device (1.22 s) + link
(~1.16 s) almost exactly SUMMED, suggesting transfers do NOT hide under
compute in the pipelined loop despite copy_to_host_async / async dispatch.
This probe measures it directly, separately per direction:

  A. d2h alone: np.asarray(16 MB device buffer)
  B. compute alone: a ~1 s chained-conv fori_loop
  C. compute dispatched async, then d2h of an UNRELATED ready buffer,
     then block on compute. If total(C) ~= max(A, B): overlap works.
     If total(C) ~= A + B: the runtime serializes d2h against execution.
  D. same with h2d (device_put of a host buffer while compute runs).

The answer decides whether bench.py's e2e gap is fixable by pipelining
(deferred fetches) or is a hard per-cycle link tax this environment imposes.

Usage (real chip): python scripts/overlap_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # ~1 s compute chain: big matmuls in a value-dependency loop (the
    # environment value-caches identical executions and lazily skips
    # unfetched dispatches — a final scalar fetch defeats both).
    N = 4096

    @jax.jit
    def chain(x, iters):
        def body(_, c):
            return jnp.tanh(c @ w)
        return jax.lax.fori_loop(0, iters, body, x)

    w = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.02, (N, N)), jnp.bfloat16)
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (N, N)), jnp.bfloat16)
    iters = jnp.int32(int(os.environ.get("PROBE_ITERS", "400")))
    jax.block_until_ready(chain(x0, jnp.int32(2)))  # compile

    MB = 16
    # DISTINCT device buffers per fetch: the tunnel runtime value-caches a
    # repeat d2h of the same buffer (measured: 2nd fetch returns in 0.1 ms).
    base = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, MB * 1 << 20, dtype=np.uint8))
    bump = jax.jit(lambda b, k: b + jnp.uint8(k))
    d2h_buf = jax.block_until_ready(bump(base, 1))
    d2h_buf2 = jax.block_until_ready(bump(base, 2))
    h2h_src = np.random.default_rng(3).integers(
        0, 255, MB * 1 << 20, dtype=np.uint8)

    def t(f):
        t0 = time.perf_counter()
        out = f()
        return time.perf_counter() - t0, out

    # warm each path once
    _ = np.asarray(d2h_buf[: 1 << 20])
    jax.block_until_ready(jax.device_put(h2h_src[: 1 << 20]))

    results = {}
    dt, _ = t(lambda: np.asarray(d2h_buf))
    results["A_d2h_alone_s"] = dt
    dt, out = t(lambda: jax.block_until_ready(chain(x0, iters)))
    results["B_compute_alone_s"] = dt

    def c_concurrent():
        h = chain(x0, iters)          # async dispatch
        t1 = time.perf_counter()
        _ = np.asarray(d2h_buf2)      # unrelated, materialized, NEVER fetched
        d2h_inner = time.perf_counter() - t1
        jax.block_until_ready(h)
        return d2h_inner
    dt, d2h_inner = t(c_concurrent)
    results["C_compute_plus_d2h_s"] = dt
    results["C_d2h_inner_s"] = d2h_inner

    def d_concurrent():
        h = chain(x0, iters)
        t1 = time.perf_counter()
        up = jax.device_put(h2h_src)
        jax.block_until_ready(up)
        h2d_inner = time.perf_counter() - t1
        jax.block_until_ready(h)
        return h2d_inner
    dt, h2d_inner = t(d_concurrent)
    results["D_compute_plus_h2d_s"] = dt
    results["D_h2d_inner_s"] = h2d_inner

    for k, v in results.items():
        print(f"{k:24s} {v*1e3:9.1f} ms", flush=True)
    a, b = results["A_d2h_alone_s"], results["B_compute_alone_s"]
    c = results["C_compute_plus_d2h_s"]
    print(f"\nd2h overlap verdict: total {c:.2f}s vs max {max(a,b):.2f}s "
          f"(overlap) vs sum {a+b:.2f}s (serialized)")
    d = results["D_compute_plus_h2d_s"]
    print(f"h2d overlap verdict: total {d:.2f}s vs max "
          f"{max(results['D_h2d_inner_s'], b):.2f}s vs sum "
          f"{results['D_h2d_inner_s']+b:.2f}s")


if __name__ == "__main__":
    main()
