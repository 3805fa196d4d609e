"""Sub-stage decomposition of the encode FRONT at bench geometry (VERDICT
r4 #1: the encode side never had a published per-stage breakdown).

The front (driver._front_fn) is one fused executable: to_model_range ->
VQGAN encode (conv tower + 3 attn blocks at [B,6144,512]) + quantize ->
ELIC dual-beta encoder -> hyperencoder -> z symbolize. Here each sub-stage
is jitted SEPARATELY so its cost can be attributed; the separate-stage sum
overstates the fused front slightly (lost fusion at the boundaries), so
the fused front is timed alongside as the ground truth.

Usage (real chip): python scripts/encode_front_profile.py
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

    from dc_vic_tpu.codec.driver import Codec, _pad_np
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.models.dc_vic import to_model_range
    from dc_vic_tpu.utils.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        cfg["codec_dtype"] = "bfloat16"
    cfg["entropy_precision"] = os.environ.get("BENCH_ENTROPY_PRECISION",
                                              "default")
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))
    codec = Codec(spec, params,
                  lanes=int(os.environ.get("BENCH_LANES", "512")))
    p = codec.params

    B, H, W = 16, 768, 512
    rng = np.random.default_rng(0)
    NBUF = 3
    b1 = jnp.array([1.0], jnp.float32)
    x = _pad_np(np.clip(rng.normal(128, 40, (B, H, W, 3)), 0,
                        255).astype(np.uint8))
    xs = [jnp.asarray(np.ascontiguousarray(np.roll(x, i, axis=0)))
          for i in range(NBUF)]
    xf32s = [jax.jit(lambda a: to_model_range(a))(xi) for xi in xs]
    jax.block_until_ready(xf32s)

    rows = []

    def stage(label, fn, arg_sets):
        dt = timeit(fn, arg_sets)
        rows.append((label, dt * 1e3))
        print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
        return [fn(*a) for a in arg_sets]

    # --- 1. VQGAN encoder tower alone (pre-quant latent h) --------------
    vq_enc = jax.jit(lambda x: module.apply(
        p, x, method=lambda m, x: m.vq_model.encode(x)))
    hs = stage("vqgan encoder (convs + 3x attn) -> h", vq_enc,
               [(xi,) for xi in xf32s])

    # --- 2. VQ argmin quantize ------------------------------------------
    vq_q = jax.jit(lambda h: module.apply(
        p, h.astype(jnp.float32), method=module.vq_quantize))
    vqs = stage("vq quantize (pallas argmin + lookup)", vq_q,
                [(h,) for h in hs])

    # --- 3. ELIC dual-beta encoder --------------------------------------
    elic = jax.jit(lambda x, lat, idx: module.apply(
        p, x, lat, idx, b1, b1, method=module.comp_encode))
    ys = stage("elic dual-beta encoder -> y", elic,
               [(xi, v[0], v[1]) for xi, v in zip(xf32s, vqs)])

    # --- 4. hyperencoder + z symbolize ----------------------------------
    def hyp_fn(m, y):
        z = jax.lax.optimization_barrier(
            m.hyperencoder(y).astype(jnp.float32))
        z_sym = m.entropy_z.quantize_symbols(z)
        return jnp.clip(z_sym, -32000, 32000).astype(jnp.int16)
    hyp = jax.jit(lambda y: module.apply(p, y, method=hyp_fn))
    stage("hyperencoder + z symbolize", hyp, [(y,) for y in ys])

    # --- fused front (ground truth) -------------------------------------
    front = codec._get_jit(("front", x.shape),
                           lambda: codec._front_fn(x.shape))
    flat = [jnp.asarray(np.ascontiguousarray(np.roll(x, i, axis=0))
                        .reshape(-1)) for i in range(NBUF)]
    stage("FUSED front (all of the above, one executable)",
          lambda xf: front(p, xf, b1, b1), [(f,) for f in flat])

    ssum = sum(ms for label, ms in rows[:4])
    print(f"{'sum of separate stages':52s} {ssum:8.2f} ms", flush=True)

    # --- A/B: attention kernel off (XLA einsum path) --------------------
    from dc_vic_tpu.ops import attention as attn_mod
    real_impl = attn_mod._flash_attention_fwd_impl
    attn_mod._flash_attention_fwd_impl = lambda q, k, v: (
        attn_mod._reference_attention(q, k, v))
    try:
        vq_enc_noflash = jax.jit(lambda x: module.apply(
            p, x, method=lambda m, x: m.vq_model.encode(x) * 1.0))
        stage("vqgan encoder with XLA-einsum attention (A/B)",
              vq_enc_noflash, [(xi,) for xi in xf32s])
    finally:
        attn_mod._flash_attention_fwd_impl = real_impl


if __name__ == "__main__":
    main()
