"""Marginal in-graph cost of GroupNorm stats next to their producer conv.

The recon trace shows big `convert_reduce_fusion` ops (trace_probe.py);
the question is whether those fusions CONTAIN the producer convolutions
(stats riding the conv epilogue for ~free) or are standalone slow reduces.
This times, at two hot shapes, conv / conv+GN / GN alone in one process
with on-device inputs: marginal = t(conv+gn) - t(conv). If marginal is
~0 the baseline lowering is already optimal and a custom stats kernel can
only lose (it must re-read the conv output from HBM).

Usage (real chip): python scripts/gn_fusion_probe.py [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPES = {
    # (B, H, W, Cin, Cout)
    "L1_384x256_256to256": (16, 384, 256, 256, 256),
    "L0_768x512_256to128": (16, 768, 512, 256, 128),
}


def bench(fn, arg_sets, iters, warmup=2):
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
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.nn.layers import num_groups32

    dt = jnp.bfloat16
    for sname, (B, H, W, Ci, Co) in SHAPES.items():
        g = num_groups32(Co)
        key = jax.random.PRNGKey(0)
        mk = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, Ci), jnp.float32).astype(dt))
        xs = [mk(jax.random.fold_in(key, i)) for i in range(2)]
        kern = (jax.random.normal(jax.random.fold_in(key, 9),
                                  (3, 3, Ci, Co)) * 0.05).astype(dt)
        gamma = jnp.ones((Co,), jnp.float32)
        beta = jnp.zeros((Co,), jnp.float32)
        flops = 2 * B * H * W * 9 * Ci * Co

        def conv(x):
            return jax.lax.conv_general_dilated(
                x, kern, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def gn(h):
            return nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=dt).apply(
                {"params": {"scale": gamma, "bias": beta}}, h)

        variants = {
            "conv": jax.jit(lambda x: conv(x)),
            "conv_gn": jax.jit(lambda x: gn(conv(x))),
            "conv_gn_swish": jax.jit(
                lambda x: nn.silu(gn(conv(x))).astype(dt)),
            "gn_alone": jax.jit(lambda x: gn(x[..., :Co])),
        }
        res = {}
        for vname, fn in variants.items():
            dt_s = bench(fn, [(x,) for x in xs], args.iters)
            res[vname] = dt_s
            tf = flops / dt_s / 1e12
            print(f"{sname:22s} {vname:14s} {dt_s*1e3:8.2f} ms "
                  f"({tf:6.1f} TF/s-of-conv)", flush=True)
        print(f"{sname:22s} marginal GN     "
              f"{(res['conv_gn']-res['conv'])*1e3:8.2f} ms ; "
              f"marginal GN+swish {(res['conv_gn_swish']-res['conv'])*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
