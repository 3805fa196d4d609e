"""Probe: does the v5e MXU's int8 path beat bf16 for the recon hot convs?

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16. If XLA lowers an
int8xint8->int32 conv at anywhere near that, quantizing the (pixels-only,
stream-safe) reconstruction stack is a 2x lever. This times the bench-
geometry hot shapes in bf16 vs int8 (and int8 with f32 dequant epilogue,
which is what a real quantized resblock needs).

Usage (real chip): python scripts/int8_conv_probe.py
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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    shapes = [
        (16, 768, 512, 128, 128),
        (16, 384, 256, 256, 256),
        (16, 192, 128, 512, 512),
        (16, 96, 64, 512, 512),
    ]
    rng = np.random.default_rng(0)
    NBUF = 3
    for (B, H, W, Cin, Cout) in shapes:
        flops = 2 * B * H * W * 9 * Cin * Cout
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(x, k, dt, acc):
            return jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (1, 1), "SAME",
                dimension_numbers=dn, preferred_element_type=acc)

        xs = [jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.float32)
              for _ in range(NBUF)]
        ks = jnp.asarray(rng.normal(0, 0.05, (3, 3, Cin, Cout)), jnp.float32)
        xi = [jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)), jnp.int8)
              for _ in range(NBUF)]
        ki = jnp.asarray(rng.integers(-127, 128, (3, 3, Cin, Cout)), jnp.int8)

        f_bf16 = jax.jit(lambda x, k: conv(x, k, jnp.bfloat16, jnp.float32))
        t = timeit(f_bf16, [(x, ks) for x in xs])
        print(f"[{B},{H},{W},{Cin}]->{Cout}  bf16: {t*1e3:7.2f} ms "
              f"{flops/t/1e12:6.1f} TF/s", flush=True)

        try:
            f_i8 = jax.jit(lambda x, k: conv(x, k, jnp.int8, jnp.int32))
            t = timeit(f_i8, [(x, ki) for x in xi])
            print(f"{'':28s}int8: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{'':28s}int8: FAILED {type(e).__name__}: {e}",
                  flush=True)

        try:
            # realistic quantized layer: int8 conv + f32 dequant + bias+swish
            sc = jnp.asarray(rng.uniform(0.9, 1.1, (Cout,)), jnp.float32)

            def qlayer(x, k, s):
                o = conv(x, k, jnp.int8, jnp.int32)
                o = o.astype(jnp.float32) * s
                return o * jax.nn.sigmoid(o)
            f_q = jax.jit(qlayer)
            t = timeit(f_q, [(x, ki, sc) for x in xi])
            print(f"{'':20s}int8+dequant: {t*1e3:7.2f} ms "
                  f"{flops/t/1e12:6.1f} TOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{'':20s}int8+dequant: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
