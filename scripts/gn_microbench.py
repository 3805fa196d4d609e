"""GroupNorm A/B at the reconstruction stack's hot shapes.

scripts/trace_probe.py attributed 219 ms of the 484 ms recon graph to the
GN stat reductions (convert_reduce_fusion). This times flax nn.GroupNorm
vs the Pallas streaming-stats lowering (ops/gn.py) standalone at the four
dominant shapes, plus the stats pass alone vs its HBM-bandwidth floor.

All inputs are generated ON DEVICE (jax.random) and the correctness check
fetches one scalar — the tunnel link is ~30 MB/s, so host-side buffers at
these shapes (1.6 GB each) would dominate the run by minutes.

Usage (real chip): python scripts/gn_microbench.py [--iters 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPES = {
    "s1_768x512x128": (16, 768, 512, 128),
    "s2_384x256x256": (16, 384, 256, 256),
    "s3_192x128x512": (16, 192, 128, 512),
    "s4_96x64x512": (16, 96, 64, 512),
}


def bench(fn, arg_sets, iters, warmup=2):
    import jax
    out = None
    for args in arg_sets:
        out = fn(*args)
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--shapes", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.nn.layers import num_groups32
    from dc_vic_tpu.ops.gn import channel_sums, group_norm

    dt = jnp.dtype(args.dtype)
    names = list(SHAPES) if args.shapes == "all" else args.shapes.split(",")
    NBUF = 2
    rows = []
    for sname in names:
        B, H, W, C = SHAPES[sname]
        g = num_groups32(C)
        key = jax.random.PRNGKey(0)
        mk = jax.jit(lambda k: (jax.random.normal(
            k, (B, H, W, C), jnp.float32) + 0.3).astype(dt))
        xs = [mk(jax.random.fold_in(key, i)) for i in range(NBUF)]
        gamma = (jax.random.normal(jax.random.fold_in(key, 10),
                                   (C,)) * 0.2 + 1.0).astype(jnp.float32)
        beta = (jax.random.normal(jax.random.fold_in(key, 11),
                                  (C,)) * 0.1).astype(jnp.float32)
        gbytes = B * H * W * C * dt.itemsize / 1e9

        flax_gn = jax.jit(lambda x: nn.GroupNorm(
            num_groups=g, epsilon=1e-6, dtype=dt).apply(
            {"params": {"scale": gamma, "bias": beta}}, x))
        ours = jax.jit(lambda x: group_norm(x, gamma, beta, g))
        stats = jax.jit(lambda x: channel_sums(x))

        err_fn = jax.jit(lambda x: jnp.max(jnp.abs(
            ours(x).astype(jnp.float32) - flax_gn(x).astype(jnp.float32)))
            / (jnp.max(jnp.abs(flax_gn(x).astype(jnp.float32))) + 1e-9))
        err = float(err_fn(xs[0]))

        for vname, fn in (("flax_gn", flax_gn), ("pallas_gn", ours),
                          ("stats_only", stats)):
            dt_s = bench(fn, [(x,) for x in xs], args.iters)
            bw = gbytes / dt_s  # read-once floor for stats; gn moves ~3x
            rows.append((sname, vname, dt_s * 1e3, bw, err))
            print(f"{sname:16s} {vname:11s} {dt_s*1e3:8.2f} ms "
                  f"{bw:7.1f} GB/s(read)  relerr={err:.2e}", flush=True)

    print("\n| shape | variant | ms | GB/s (input-read) | rel err |")
    print("|---|---|---|---|---|")
    for sname, vname, ms, bw, err in rows:
        print(f"| {sname} | {vname} | {ms:.2f} | {bw:.0f} | {err:.1e} |")


if __name__ == "__main__":
    main()
