"""Stage decomposition of the reconstruction graph at bench geometry.

reconstruct_uint8 (the decode pipeline's largest constituent, ~530 ms/batch
in the round-3 profile) = ELIC beta-FiLM decoder get_feats -> Swin VQ
estimator -> argmax/codebook/post_quant -> fused VQGAN decode. This times
each stage as its own jitted graph at the flagship shapes (batch 16, Kodak
768x512), plus the whole graph with the folded-upsample optimization ON vs
OFF (models/vqgan.py::Upsample).

Usage (real chip): python scripts/recon_profile.py
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

    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        cfg["codec_dtype"] = "bfloat16"
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    B, yH, yW = 16, 48, 32
    Cy = module.bottleneck_y
    rng = np.random.default_rng(0)
    NBUF = 3
    b1 = jnp.ones((B,), jnp.float32)
    yhats = [jnp.asarray(rng.normal(0, 2, (B, yH, yW, Cy)), jnp.float32)
             for _ in range(NBUF)]

    rows = []

    def record(name, dt):
        rows.append((name, dt * 1e3))
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)

    # stage 1: ELIC decoder get_feats
    def feats_m(m, y):
        return m.decoder.get_feats(y, b1, b1)
    feats = jax.jit(lambda p, y: module.apply(p, y, method=feats_m))
    record("ELIC get_feats", timeit(feats, [(params, y) for y in yhats]))
    feat0, cond0 = feats(params, yhats[0])

    # stage 2: Swin VQ estimator + argmax + codebook + post_quant
    def est_m(m, f):
        _, logits = m.vq_estimator(f)
        idx = jnp.argmax(logits, axis=-1)
        return m.vq_model.post_quant_conv(m.vq_indices_to_latent(idx))
    est = jax.jit(lambda p, f: module.apply(p, f, method=est_m))
    feats_bufs = [feats(params, y) for y in yhats]
    record("VQ estimator (+argmax/codebook/pq)",
           timeit(est, [(params, fb[0]) for fb in feats_bufs]))
    lat0 = est(params, feat0)

    # stage 3: fused VQGAN decode (taps)
    def dec_m(m, lat, cf):
        return m.fused_decoder(lat, cf, 1.0)
    dec = jax.jit(lambda p, lat, cf: module.apply(p, lat, cf, method=dec_m))
    lats = [est(params, fb[0]) for fb in feats_bufs]
    record("fused VQGAN decode",
           timeit(dec, [(params, la, fb[1])
                        for la, fb in zip(lats, feats_bufs)]))

    total = sum(ms for _, ms in rows)
    print(f"\nsum of stages: {total:.1f} ms", flush=True)

    # whole graph at defaults
    recon = jax.jit(lambda p, y: module.apply(
        p, y, b1, b1, method=module.reconstruct_uint8))
    dt = timeit(recon, [(params, y) for y in yhats])
    print(f"reconstruct_uint8 (defaults): {dt*1e3:8.2f} ms", flush=True)
    if os.environ.get("RECON_AB") != "1":
        return

    # A/B the folded-upsample (vqgan.py) and sub-pixel-deconv
    # (layers.py DeconvTorch) rewrites
    for fold in ("1", "0"):
        for sub in ("1", "0"):
            os.environ["DCVIC_FOLDED_UPSAMPLE"] = fold
            os.environ["DCVIC_SUBPIXEL_DECONV"] = sub
            recon = jax.jit(lambda p, y, _k=(fold, sub): module.apply(
                p, y, b1, b1, method=module.reconstruct_uint8))
            dt = timeit(recon, [(params, y) for y in yhats])
            print(f"reconstruct_uint8 (folded_upsample={fold}, "
                  f"subpixel_deconv={sub}): {dt*1e3:8.2f} ms", flush=True)
    os.environ.pop("DCVIC_FOLDED_UPSAMPLE", None)
    os.environ.pop("DCVIC_SUBPIXEL_DECONV", None)


if __name__ == "__main__":
    main()
