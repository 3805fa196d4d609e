"""A/B: fused encode-front monolith vs a split two-executable front.

encode_front_profile.py showed the SUM of separately-jitted front stages
(vqgan encode+quantize / ELIC / hyper) measuring ~31 ms FASTER than the
fused monolith in the same run — XLA's scheduling of the giant graph may
be worse than dispatching the stages back to back. Splitting is stream-
safe: y is encoder-side only (symbols are transmitted; the decoder never
recomputes y), so its lowering may change freely.

A: front = one executable (the shipped _front_fn)
B: vq = to_model_range + vqgan encode + quantize (one executable)
   fv = encode_front_from_vq (ELIC + hyper + z symbolize, one executable)

Usage (real chip): python scripts/front_split_ab.py
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

    from dc_vic_tpu.codec.driver import Codec, _pad_np
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.models.dc_vic import to_model_range
    from dc_vic_tpu.utils.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    cfg["codec_dtype"] = "bfloat16"
    cfg["entropy_precision"] = "default"
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))
    codec = Codec(spec, params, lanes=512)
    p = codec.params
    b1 = jnp.array([1.0], jnp.float32)

    B, H, W = 16, 768, 512
    rng = np.random.default_rng(0)
    x = _pad_np(np.clip(rng.normal(128, 40, (B, H, W, 3)), 0,
                        255).astype(np.uint8))
    NBUF = 3
    flats = [jnp.asarray(np.ascontiguousarray(np.roll(x, i, axis=0))
                         .reshape(-1)) for i in range(NBUF)]

    # A: fused monolith
    front = codec._get_jit(("front", x.shape),
                           lambda: codec._front_fn(x.shape))
    dt_a = timeit(lambda xf: front(p, xf, b1, b1), [(f,) for f in flats])
    print(f"A fused front:              {dt_a*1e3:8.2f} ms", flush=True)

    # B: split — vq executable + from_vq executable
    def vq_fn(m, xf):
        xi = to_model_range(xf.reshape(x.shape))
        return m.vq_encode(xi)
    vq = jax.jit(lambda xf: module.apply(p, xf, method=vq_fn))
    fv = codec._get_jit(("front_vq",), codec._front_from_vq_fn)

    def run_b(xf):
        lat, idx = vq(xf)
        return fv(p, xf.reshape(x.shape), lat, idx, b1, b1)
    dt_b = timeit(run_b, [(f,) for f in flats])
    print(f"B split vq + from_vq:       {dt_b*1e3:8.2f} ms", flush=True)
    print(f"delta: {(dt_a-dt_b)*1e3:+.2f} ms "
          f"({'split wins' if dt_b < dt_a else 'fused wins'})", flush=True)


if __name__ == "__main__":
    main()
