"""In-process A/Bs for two decode-path knobs (single run = no chip drift):

1. DCVIC_SCAN_UNROLL sweep on the real y-stream rANS decode scan (6 chained
   ChARM sections at bench geometry). The scan's per-step cost is mostly
   loop bookkeeping, not the per-symbol gather (PERF.md section 4) —
   unrolling amortizes it.
2. flash_attention at the VQGAN hot shape [16, 6144, 512]: f32 vs bf16
   operands (f32 accumulation both ways). f32 MXU products run at ~1/4 the
   bf16 rate, and the recon path has no bitstream constraint.

Usage (real chip): python scripts/scan_attn_ab.py
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

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.ops.rans_device import (decode_section, encode_stream,
                                            pack_streams, section_lanes)
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
    L = section_lanes(ny, lanes)
    nrows = ytab.adv_flat.size >> 16
    secs = [(jnp.asarray(rng.integers(-4, 5, (B, ny // L, L)), np.int32),
             jnp.asarray(rng.integers(0, nrows, (B, ny // L, L)), np.int32))
            for _ in range(ns)]
    os.environ["DCVIC_SCAN_UNROLL"] = "1"
    vals, mask = jax.jit(lambda s: encode_stream(
        [(sym, idx) for sym, idx in s], ytab))(secs)
    packed, counts = jax.jit(pack_streams)(vals, mask)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    idx_list = [idx for _, idx in secs]
    ref_sym = None

    for unroll in ("1", "2", "4", "8"):
        os.environ["DCVIC_SCAN_UNROLL"] = unroll

        def y_scans(words, b_, il):
            cursor = jnp.zeros((B,), jnp.int32)
            state = None
            outs = []
            for i in range(ns):
                s_, cursor, state = decode_section(words, b_, cursor, state,
                                                   il[i], ytab)
                outs.append(s_)
            return jnp.stack(outs), cursor

        jy = jax.jit(y_scans)
        out = jy(packed, base, idx_list)
        sym0 = np.asarray(out[0][0])
        if ref_sym is None:
            ref_sym = sym0
            assert np.array_equal(sym0, np.asarray(secs[0][0]))
        else:
            assert np.array_equal(sym0, ref_sym), "unroll changed symbols!"
        dt = timeit(jy, [(packed, base, idx_list)])
        print(f"y rANS decode x{ns} (L={L}, unroll={unroll}): "
              f"{dt*1e3:8.2f} ms", flush=True)
    os.environ.pop("DCVIC_SCAN_UNROLL", None)

    # --- attention dtype A/B at the VQGAN decoder hot shape
    from dc_vic_tpu.ops.attention import flash_attention
    N, C = (yH * 2) * (yW * 2), 512
    NBUF = 2
    qkvs = [tuple(jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)
                  for _ in range(3)) for _ in range(NBUF)]
    fa32 = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    dt32 = timeit(fa32, qkvs)
    fa16 = jax.jit(lambda q, k, v: flash_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16)))
    dt16 = timeit(fa16, qkvs)
    o32 = np.asarray(fa32(*qkvs[0]), np.float32)
    o16 = np.asarray(fa16(*qkvs[0]), np.float32)
    rel = np.max(np.abs(o32 - o16)) / (np.max(np.abs(o32)) + 1e-9)
    print(f"flash_attention [16,{N},{C}]: f32 {dt32*1e3:.2f} ms, "
          f"bf16 {dt16*1e3:.2f} ms, max rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
