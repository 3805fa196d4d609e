"""Conv roofline microbenchmark at the codec's four hottest 3x3 shapes.

Round-2's PERF.md asserted a ~9.4 img/s "chip ceiling" from XLA's conv
lowering running at ~40% of the v5e MXU peak; this script is the committed
counter-experiment: XLA conv (f32/bf16), the 9-shifted-matmul formulation
in pure XLA, an im2col single-matmul, and the Pallas direct kernel
(dc_vic_tpu/ops/conv3x3.py), measured per shape with runtime-varying
inputs (constants would fold). Results table lives in docs/PERF.md.

Usage: python scripts/conv_microbench.py [--iters 20] [--shapes all]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The four dominant reconstruction-stack shapes at Kodak 768x512, batch 16
# (VQGAN decoder stages 512/512/256/128ch + ELIC decoder; see PERF.md #3).
SHAPES = {
    "s1_768x512x128": (16, 768, 512, 128, 128),
    "s2_384x256x256": (16, 384, 256, 256, 256),
    "s3_192x128x512": (16, 192, 128, 512, 512),
    "s4_96x64x512": (16, 96, 64, 512, 512),
}


def bench(fn, arg_sets, iters, warmup=3):
    """Times fn cycling across DISTINCT input buffers: this environment was
    observed to value-cache identical executions of the same computation
    (returns in microseconds at impossible TF/s) — see docs/PERF.md §5."""
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


def bench_resblock(args, jax, jnp):
    """Composite A/B at the hot shapes: the full GN->swish->conv x2 (+res)
    ResnetBlock via (a) the plain XLA lowering (its epilogue fusion intact)
    vs (b) the fused Pallas path (ops/conv3x3.py::conv3x3_gn_swish). This is
    the honest unit: round 3 measured the UNfused Pallas conv losing
    in-graph despite a 1.33-1.66x standalone win (PERF.md section 5)."""
    from dc_vic_tpu.models import vqgan

    rng = np.random.default_rng(0)
    names = (list(SHAPES) if args.shapes == "all"
             else args.shapes.split(","))
    NBUF = 4
    print("\n== resblock composite (GN+swish+conv x2 + res) ==")
    rows = []
    for sname in names:
        B, H, W, C, Cout = SHAPES[sname]
        flops = 2 * 2 * B * H * W * 9 * C * Cout  # two 3x3 convs
        block = vqgan.VQResnetBlock(out_ch=Cout, dtype=jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        params = jax.jit(block.init)(jax.random.PRNGKey(0), x0)
        xs = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
              for _ in range(NBUF)]
        ref = None
        for vname, fused in (("xla_bf16", False), ("fused_bf16", True)):
            os.environ["DCVIC_FUSED_RESBLOCK"] = "1" if fused else "0"
            try:
                jfn = jax.jit(lambda p, x: block.apply(p, x)).lower(
                    params, xs[0]).compile()
                out = np.asarray(jfn(params, xs[0]), np.float32)
                if ref is None:
                    ref = out
                err = float(np.max(np.abs(out - ref))
                            / (np.abs(ref).max() + 1e-9))
                dt_s = bench(lambda x: jfn(params, x),
                             [(x,) for x in xs], args.iters)
                tf = flops / dt_s / 1e12
                rows.append((sname, vname, dt_s * 1e3, tf, err))
                print(f"{sname:16s} {vname:12s} {dt_s*1e3:8.2f} ms "
                      f"{tf:7.1f} TF/s  relerr={err:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{sname:16s} {vname:12s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        os.environ.pop("DCVIC_FUSED_RESBLOCK", None)
    print("\n| shape | variant | ms | TF/s(conv) | rel err |")
    print("|---|---|---|---|---|")
    for sname, vname, ms, tf, err in rows:
        print(f"| {sname} | {vname} | {ms:.2f} | {tf:.1f} | {err:.1e} |")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--shapes", type=str, default="all")
    p.add_argument("--mode", type=str, default="conv",
                   choices=["conv", "resblock"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    if args.mode == "resblock":
        bench_resblock(args, jax, jnp)
        return

    from dc_vic_tpu.ops.conv3x3 import conv3x3_same

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def shifted_matmul(x, w):
        B, H, W, C = x.shape
        Cout = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, Cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (B, H, W, C))
                acc = acc + jax.lax.dot_general(
                    xs, w[dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)

    def im2col_matmul(x, w):
        B, H, W, C = x.shape
        Cout = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            for dy in range(3) for dx in range(3)], axis=-1)
        y = jax.lax.dot_general(
            cols, w.reshape(9 * C, Cout),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    variants = {
        "xla_f32": (xla_conv, jnp.float32),
        "xla_bf16": (xla_conv, jnp.bfloat16),
        "shift9_f32": (shifted_matmul, jnp.float32),
        "shift9_bf16": (shifted_matmul, jnp.bfloat16),
        "im2col_bf16": (im2col_matmul, jnp.bfloat16),
        "pallas_f32": (conv3x3_same, jnp.float32),
        "pallas_bf16": (conv3x3_same, jnp.bfloat16),
    }

    rng = np.random.default_rng(0)
    rows = []
    names = (list(SHAPES) if args.shapes == "all"
             else args.shapes.split(","))
    NBUF = 4
    for sname in names:
        B, H, W, C, Cout = SHAPES[sname]
        flops = 2 * B * H * W * 9 * C * Cout
        x_nps = [rng.standard_normal((B, H, W, C), np.float32)
                 for _ in range(NBUF)]
        w_np = rng.standard_normal((3, 3, C, Cout), np.float32) * 0.05
        ref = None
        for vname, (fn, dt) in variants.items():
            xs = [jnp.asarray(x_np, dt) for x_np in x_nps]
            w = jnp.asarray(w_np, dt)
            jfn = jax.jit(fn)
            try:
                out = np.asarray(jfn(xs[0], w), np.float32)
                if ref is None:
                    ref = out
                err = float(np.max(np.abs(out - ref))
                            / (np.abs(ref).max() + 1e-9))
                dt_s = bench(jfn, [(x, w) for x in xs], args.iters)
                tf = flops / dt_s / 1e12
                rows.append((sname, vname, dt_s * 1e3, tf, err))
                print(f"{sname:16s} {vname:12s} {dt_s*1e3:8.2f} ms "
                      f"{tf:7.1f} TF/s  relerr={err:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{sname:16s} {vname:12s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    print("\n| shape | variant | ms | TF/s | rel err |")
    print("|---|---|---|---|---|")
    for sname, vname, ms, tf, err in rows:
        print(f"| {sname} | {vname} | {ms:.2f} | {tf:.1f} | {err:.1e} |")


if __name__ == "__main__":
    main()
