"""Standalone A/B: 5x5/stride-2 conv on the raw 3-channel image vs the
space-to-depth fold (s2d(2) -> 3x3/stride-1 conv at C_in=12).

trace_probe --what elic attributes 8.4 ms (21% of the ELIC encoder) to
conv1 — a 5x5/s2 conv at C_in=3, ~2% MXU utilization. The classic fix is
folding the stride into channels. Equivalence: with zero SAME padding,
  o(i,j) = sum_{u,v=-2..2} w[u+2,v+2] x(2i+u, 2j+v)
and writing u = 2p + r (p in {-1,0,1}, r in {0,1}) the sum becomes a 3x3
conv over 2x2 cells with a [3,3,12,C] kernel whose (p,q) tap holds
w[2p+r+2, 2q+c+2] at fold-channel (r,c,cin) — zero where the original
tap index leaves [0,5). This probe checks numeric equivalence and times
both at the bench shape. Shipping it would keep the parameter tree
reference-compatible (the fold happens inside the forward).

Usage (real chip): python scripts/s2d_conv1_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=10, warmup=3):
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


def fold_kernel(w):
    """[5,5,3,C] -> [3,3,12,C]; fold channel layout: (r, c, cin) ->
    ((r*2 + c)*3 + cin)."""
    import jax.numpy as jnp
    K = np.zeros((3, 3, 12, w.shape[-1]), np.float32)
    wn = np.asarray(w, np.float32)
    for p in (-1, 0, 1):
        for q in (-1, 0, 1):
            for r in (0, 1):
                for c in (0, 1):
                    u, v = 2 * p + r, 2 * q + c
                    if -2 <= u <= 2 and -2 <= v <= 2:
                        K[p + 1, q + 1, (r * 2 + c) * 3:(r * 2 + c) * 3 + 3] \
                            = wn[u + 2, v + 2]
    return jnp.asarray(K)


def s2d(x):
    import jax.numpy as jnp
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(os.path.dirname(__file__),
                                                  "..", ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, H, W, Cout = 16, 768, 512, 192
    dt = jnp.bfloat16
    xs = [jnp.asarray(rng.normal(0, 1, (B, H, W, 3)), dt) for _ in range(3)]
    w = jnp.asarray(rng.normal(0, 0.05, (5, 5, 3, Cout)), jnp.float32)

    def conv5(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(dt), (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    kf = fold_kernel(w)

    def conv_fold(x, kf):
        return jax.lax.conv_general_dilated(
            s2d(x), kf.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ja = jax.jit(conv5)
    jb = jax.jit(conv_fold)
    a = np.asarray(ja(xs[0], w), np.float32)
    b = np.asarray(jb(xs[0], kf), np.float32)
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"shapes {a.shape} vs {b.shape}; rel maxdiff {err:.2e}", flush=True)
    assert a.shape == b.shape

    ta = timeit(lambda x: ja(x, w), [(x,) for x in xs])
    tb = timeit(lambda x: jb(x, kf), [(x,) for x in xs])
    print(f"conv5x5/s2 C_in=3 :  {ta*1e3:7.2f} ms", flush=True)
    print(f"s2d + conv3x3 C12 :  {tb*1e3:7.2f} ms", flush=True)
    print(f"delta {((ta-tb)*1e3):+.2f} ms "
          f"({'fold wins' if tb < ta else 'plain wins'})", flush=True)


if __name__ == "__main__":
    main()
