"""Tunnel/link microbenchmark: h2d / d2h bandwidth, sync floor, and
compute-transfer overlap on the current backend.

The repo's codec pipeline is engineered around these numbers (see
docs/PERF.md); re-run after any environment change:
    python scripts/tunnel_bench.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    out = {}

    # sync floor: tiny scalar round trip
    one = jnp.ones(()).block_until_ready()
    f = jax.jit(lambda x: x + 1)
    _ = f(one).block_until_ready()
    best, med = timed(lambda: np.asarray(f(one)), n=20)
    out["sync_floor_ms"] = round(med * 1e3, 2)

    # h2d bandwidth at several sizes
    for mb in (1, 8, 32):
        host = np.random.default_rng(0).integers(
            0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
        jax.device_put(host).block_until_ready()  # warm
        best, med = timed(
            lambda: jax.device_put(host).block_until_ready(), n=4)
        out[f"h2d_{mb}MB_MBps"] = round(mb / med, 1)

    # d2h bandwidth
    for mb in (1, 8, 32):
        devarr = jax.device_put(
            np.zeros(mb * 1024 * 1024, np.uint8)).block_until_ready()
        _ = np.asarray(devarr)
        best, med = timed(lambda: np.asarray(devarr), n=4)
        out[f"d2h_{mb}MB_MBps"] = round(mb / med, 1)

    # compute-only: f32 3x3 conv stack at the recon hot shape, per-image cost
    B = 8
    x = jnp.ones((B, 768, 512, 128), jnp.float32)
    w = jnp.ones((3, 3, 128, 128), jnp.float32) * 0.01

    def convs(x, w, n=4):
        for _ in range(n):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x

    cf = jax.jit(convs)
    _ = cf(x, w).block_until_ready()
    best, med = timed(lambda: cf(x, w).block_until_ready(), n=3)
    flops = 4 * 2 * B * 768 * 512 * 128 * 128 * 9
    out["conv_f32_TFLOPs"] = round(flops / med / 1e12, 1)

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    cfb = jax.jit(convs)
    _ = cfb(xb, wb).block_until_ready()
    best, med = timed(lambda: cfb(xb, wb).block_until_ready(), n=3)
    out["conv_bf16_TFLOPs"] = round(flops / med / 1e12, 1)

    # overlap: does h2d overlap device compute?
    big = np.random.default_rng(0).integers(
        0, 255, (16 * 1024 * 1024,), dtype=np.uint8)
    # compute that takes ~ the same time as the transfer
    _ = cf(x, w).block_until_ready()

    def serial():
        r = cf(x, w)
        r.block_until_ready()
        jax.device_put(big).block_until_ready()

    def overlapped():
        r = cf(x, w)  # dispatched async
        jax.device_put(big).block_until_ready()
        r.block_until_ready()

    s, _ = timed(serial, n=3)
    o, _ = timed(overlapped, n=3)
    out["h2d_compute_serial_s"] = round(s, 3)
    out["h2d_compute_overlap_s"] = round(o, 3)
    out["h2d_overlaps_compute"] = bool(o < 0.8 * s)

    # duplex: h2d while d2h
    devarr = jax.device_put(
        np.zeros(16 * 1024 * 1024, np.uint8)).block_until_ready()
    import threading

    def duplex():
        t = threading.Thread(target=lambda: np.asarray(devarr))
        t.start()
        jax.device_put(big).block_until_ready()
        t.join()

    d, _ = timed(duplex, n=3)
    out["duplex_32MB_total_s"] = round(d, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
