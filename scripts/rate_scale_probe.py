"""Find the encoder-weight scale that puts the PRNG-init bench model's
stream rate into the published operating band.

Why: bench.py inits the flagship model with PRNG weights. Untrained
transforms emit ~2.9 bpp streams (13.9 MB/batch-16 at 768x512) — 15-60x
the rates the reference actually ships (kodak.csv: 0.054-0.189 bpp).
Since the end-to-end bench moves every stream byte across the host link
TWICE (d2h after encode, h2d before decode), the PRNG rate inflates the
link cost far beyond any production workload and makes the recorded e2e
number a tunnel benchmark instead of a codec benchmark.

The dial: scale every parameter in the encoder subtree by s<1. With
zero-init biases the analysis stack is ~positively-homogeneous, so y
(and through the hyperencoder, z) shrink monotonically with s; symbols
round(y-mu) collapse toward zero and the rate falls. Device FLOPs,
symbol counts, scan steps, and pack sizes are all UNCHANGED — only the
emitted byte volume moves, which is exactly the quantity that should
match production.

This probe sweeps s and prints bpp + stream MB per batch so bench.py can
pin a constant (BENCH_RATE_SCALE) with an asserted sanity band.

Usage (real chip): python scripts/rate_scale_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
H, W = 768, 512


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    cfg["codec_dtype"] = "bfloat16"
    cfg["entropy_precision"] = os.environ.get("BENCH_ENTROPY_PRECISION",
                                              "default")
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params0 = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(0, 4, H), np.linspace(0, 4, W),
                         indexing="ij")
    base = (np.stack([np.sin(yy + p) * np.cos(xx * 0.7 + p)
                      for p in (0.0, 1.3, 2.1)], axis=-1) + 1.0) * 110.0
    imgs = np.clip(base[None] + rng.normal(0, 12, (BATCH, H, W, 3)),
                   0, 255).astype(np.uint8)
    px = BATCH * H * W

    # One codec, params swapped in place per scale: the scale touches only
    # the encoder subtree (entropy_z is untouched, so the bottleneck CDF
    # table built at construction stays valid), and every executable takes
    # the param tree as a traced argument — zero retracing across scales.
    codec = Codec(spec, params0, lanes=512, encode_backend="device")
    for s in [float(t) for t in os.environ.get(
            "SCALES", "1.0,0.8,0.7,0.6,0.55,0.5,0.45,0.4,0.3").split(",")]:
        enc = jax.tree_util.tree_map(lambda a: a * s,
                                     params0["params"]["encoder"])
        codec.params = {**params0,
                        "params": {**params0["params"], "encoder": enc}}
        t0 = time.perf_counter()
        res = codec.compress(imgs, quality_ind=0)
        dt = time.perf_counter() - t0
        tot = sum(len(x) for r in res for x in r["string_list"])
        y_b = sum(len(r["string_list"][2]) for r in res)
        z_b = sum(len(r["string_list"][1]) for r in res)
        print(json.dumps({
            "scale": s, "bpp": round(tot * 8 / px, 4),
            "stream_mb": round(tot / 1e6, 3),
            "y_mb": round(y_b / 1e6, 3), "z_mb": round(z_b / 1e6, 3),
            "compress_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
