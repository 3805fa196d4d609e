"""Probe: does the v5e MXU's int8 path beat bf16 for the recon hot convs?

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16. If XLA lowers an
int8xint8->int32 conv at anywhere near that, quantizing the (pixels-only,
stream-safe) reconstruction stack is a 2x lever. This times the bench-
geometry hot shapes in bf16 vs int8 (and int8 with f32 dequant epilogue,
which is what a real quantized resblock needs).

Measurement note: this environment's tunnel runtime was observed BOTH to
value-cache identical executions of one executable AND to lazily skip
dispatches whose outputs are never fetched (block_until_ready acks without
executing -> impossible 10^4 TF/s rates). The only honest timing here is a
data-dependency chain: iterate the conv inside ONE jitted fori_loop whose
carry is the conv output fed back as the next input, then fetch a scalar
reduction to host. Nothing in the chain can be elided or cached.

Usage (real chip): python scripts/int8_conv_probe.py [--iters N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_time(jfn, x_warm, x_timed, iters):
    """Run the compiled chained-loop executable once warm and once timed —
    on DISTINCT inputs, so an (executable, input)-keyed value cache cannot
    serve the timed run from the warm run (the data-dependency chain
    defeats lazy-skip but not a value cache). The final np.asarray is a
    real host fetch that forces execution. Also times the warm run and
    asserts the two are the same order of magnitude — a cache hit returns
    in well under a millisecond and would trip the guard."""
    t0 = time.perf_counter()
    out = np.asarray(jfn(x_warm))  # warm (compile cached by caller's .lower)
    warm_dt = time.perf_counter() - t0
    assert np.isfinite(out), "chain diverged; renorm is wrong"
    t0 = time.perf_counter()
    out = np.asarray(jfn(x_timed))
    dt = time.perf_counter() - t0
    assert np.isfinite(out), "chain diverged; renorm is wrong"
    assert dt > 0.1 * warm_dt, (
        f"timed run ({dt*1e3:.2f} ms) is >10x faster than the warm run "
        f"({warm_dt*1e3:.2f} ms) on a distinct input — value-cache "
        "artifact; reading is not trustworthy")
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    # The four dominant reconstruction-stack shapes at Kodak 768x512,
    # batch 16 (Cin == Cout at each, so the output chains as next input).
    shapes = [
        (16, 768, 512, 128, 128),
        (16, 384, 256, 256, 256),
        (16, 192, 128, 512, 512),
        (16, 96, 64, 512, 512),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    ITERS = args.iters

    for (B, H, W, Cin, Cout) in shapes:
        flops = 2 * B * H * W * 9 * Cin * Cout

        def conv(x, k, acc):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc)

        kf = jnp.asarray(rng.normal(0, 0.05, (3, 3, Cin, Cout)), jnp.float32)
        ki = jnp.asarray(rng.integers(-127, 128, (3, 3, Cin, Cout)), np.int8)
        sc = jnp.asarray(rng.uniform(0.9, 1.1, (Cout,)), jnp.float32)
        # inputs generated ON DEVICE: a [16,768,512,128] bf16 upload is
        # 1.6 GB — tens of seconds over the tunnel, and not what we time
        mk_f = jax.jit(
            lambda k: jax.random.normal(k, (B, H, W, Cin), jnp.bfloat16))
        mk_i = jax.jit(
            lambda k: jax.random.randint(
                k, (B, H, W, Cin), -127, 128, jnp.int8))
        # two distinct buffers per dtype: warm vs timed (value-cache guard)
        xf0, xf1 = mk_f(jax.random.PRNGKey(0)), mk_f(jax.random.PRNGKey(2))
        xi0, xi1 = mk_i(jax.random.PRNGKey(1)), mk_i(jax.random.PRNGKey(3))

        def bf16_loop(x):
            def body(_, c):
                y = conv(c, kf.astype(jnp.bfloat16), jnp.float32)
                # cheap renorm keeps the chain finite without an extra pass
                y = y * lax.rsqrt(jnp.mean(y * y) + 1e-6)
                return y.astype(jnp.bfloat16)
            y = lax.fori_loop(0, ITERS, body, x)
            return jnp.sum(y.astype(jnp.float32))

        def i8_loop(x):
            def body(_, c):
                y = conv(c, ki, jnp.int32)
                # requantize: shift down and clip back to int8 range
                return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            y = lax.fori_loop(0, ITERS, body, x)
            return jnp.sum(y.astype(jnp.float32))

        def i8_dequant_loop(x):
            def body(_, c):
                y = conv(c, ki, jnp.int32)
                o = y.astype(jnp.float32) * sc          # dequant
                o = o * jax.nn.sigmoid(o * 0.001)       # swish-ish epilogue
                o = o * lax.rsqrt(jnp.mean(o * o) + 1e-6) * 64.0
                return jnp.clip(o, -127, 127).astype(jnp.int8)  # requant
            y = lax.fori_loop(0, ITERS, body, x)
            return jnp.sum(y.astype(jnp.float32))

        for name, fn, x0, x1 in (("bf16", bf16_loop, xf0, xf1),
                                 ("int8", i8_loop, xi0, xi1),
                                 ("int8+dequant", i8_dequant_loop,
                                  xi0, xi1)):
            try:
                tc = time.perf_counter()
                jfn = jax.jit(fn).lower(x0).compile()
                print(f"  .. {name} compiled in "
                      f"{time.perf_counter()-tc:.0f}s", flush=True)
                t = chain_time(jfn, x0, x1, ITERS)
                unit = "TF/s" if name == "bf16" else "TOP/s"
                print(f"[{B},{H},{W},{Cin}]->{Cout} {name:>13s}: "
                      f"{t*1e3:7.2f} ms {flops/t/1e12:6.1f} {unit}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[{B},{H},{W},{Cin}]->{Cout} {name:>13s}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
