"""Sub-stage timing of the device rANS encode pack at bench geometry:
_precompute (per-symbol start/freq/esc gathers), the reverse encode scan,
and pack_streams (the stream-compaction scatter over the worst-case
capacity buffers). Identifies which part of the ~370 ms pack stage
(scripts/encode_profile.py) to attack.

Usage (real chip): python scripts/pack_profile.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=6, warmup=2):
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

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.ops import rans_device as rd
    from dc_vic_tpu.utils.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    cfg["codec_dtype"] = "bfloat16"
    spec = build_comp_model(cfg)
    module = spec.module
    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    B, yH, yW = 16, 48, 32
    Cy = module.bottleneck_y
    ns = cfg["subnet"]["context_model"]["num_slices"]
    sc = Cy // ns
    rng = np.random.default_rng(0)
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    codec = Codec(spec, params, lanes=lanes)
    codec._ensure_dtables()
    ytab = codec._dtable("y")
    ny = yH * yW * sc
    L = rd.section_lanes(ny, lanes)
    nrows = ytab.adv_flat.size >> 16
    NBUF = 2
    sec_sets = [
        [(jnp.asarray(r.integers(-4, 5, (B, ny // L, L)), np.int32),
          jnp.asarray(r.integers(0, nrows, (B, ny // L, L)), np.int32))
         for _ in range(ns)]
        for r in (np.random.default_rng(s) for s in range(NBUF))]

    # 1. per-symbol (start, freq, esc, raw) precompute — 6 sections
    pre = jax.jit(lambda secs: [rd._precompute(s, i, ytab)
                                for s, i in secs])
    dt = timeit(pre, [(s,) for s in sec_sets])
    print(f"{'precompute x6 (start/freq gathers)':44s} {dt*1e3:8.2f} ms",
          flush=True)

    # 2. full encode_stream (precompute + reverse scan + concat)
    enc = jax.jit(lambda secs: rd.encode_stream(secs, ytab))
    dt = timeit(enc, [(s,) for s in sec_sets])
    print(f"{'encode_stream x6 (pre + scan + concat)':44s} {dt*1e3:8.2f} ms",
          flush=True)

    # 3. pack_streams (the compaction scatter) on the real vals/mask
    vm = [enc(s) for s in sec_sets]
    K = vm[0][0].shape[1]
    print(f"   capacity K = {K} words/img ({B * K / 1e6:.1f} M scattered)",
          flush=True)
    pk = jax.jit(rd.pack_streams)
    dt = timeit(pk, vm)
    print(f"{'pack_streams (compaction scatter)':44s} {dt*1e3:8.2f} ms",
          flush=True)

    # 4. the clipped + esc-count variant the driver actually dispatches
    encc = jax.jit(lambda secs: rd.encode_stream(secs, ytab, clipped=True,
                                                 with_esc_counts=True))
    dt = timeit(encc, [(s,) for s in sec_sets])
    print(f"{'encode_stream (clipped, +esc counts)':44s} {dt*1e3:8.2f} ms",
          flush=True)
    vmc = [encc(s)[:2] for s in sec_sets]
    Kc = vmc[0][0].shape[1]
    print(f"   capacity K = {Kc} words/img ({B * Kc / 1e6:.1f} M scattered)",
          flush=True)
    dt = timeit(pk, vmc)
    print(f"{'pack_streams (clipped capacity)':44s} {dt*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
