"""Stage decomposition of the device encode at bench geometry.

bench_device_cycle's encode = front (VQGAN encode + ELIC + hyperencoder +
z symbolization) -> _encode_param_chain (shared executables: hyperdecoder +
per-slice ChARM symbolize/step) -> _pack_fn (device rANS reverse pass +
stream packing + stats). This times each stage as dispatched by the real
driver at the flagship shapes (batch 16, Kodak 768x512, PRNG weights, bf16
codec dtype like bench.py).

Usage (real chip): python scripts/encode_profile.py
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
    codec._ensure_dtables()

    B, H, W = 16, 768, 512
    rng = np.random.default_rng(0)
    NBUF = 3
    b1 = jnp.array([1.0], jnp.float32)
    x = _pad_np(np.clip(rng.normal(128, 40, (B, H, W, 3)), 0,
                        255).astype(np.uint8))
    xs = [jnp.asarray(np.ascontiguousarray(np.roll(x, i, axis=0))
                      .reshape(-1)) for i in range(NBUF)]

    front = codec._get_jit(("front", x.shape),
                           lambda: codec._front_fn(x.shape))

    def run_front(xf):
        return front(codec.params, xf, b1, b1)

    dt = timeit(run_front, [(xf,) for xf in xs])
    print(f"{'front (VQGAN enc + ELIC + hyper + z sym)':44s} "
          f"{dt*1e3:8.2f} ms", flush=True)

    fronts = [run_front(xf) for xf in xs]

    def run_chain(y, z_sym):
        return codec._encode_param_chain(y, z_sym)

    dt = timeit(run_chain, fronts)
    print(f"{'param chain (hyper + 6x sym/step)':44s} {dt*1e3:8.2f} ms",
          flush=True)

    chains = [run_chain(*f) for f in fronts]
    pack = codec._get_jit(("pack",), codec._pack_fn)

    def run_pack(ch, fr):
        y_syms, y_idxs, _, _ = ch
        return pack(y_syms, y_idxs, fr[1], ch[2])

    dt = timeit(run_pack, list(zip(chains, fronts)))
    print(f"{'pack (device rANS reverse pass + stats)':44s} "
          f"{dt*1e3:8.2f} ms", flush=True)

    # whole encode as bench_device_cycle dispatches it
    def run_enc(xf):
        y, z_sym = front(codec.params, xf, b1, b1)
        out = codec._encode_tail(y, z_sym, tpu_dev=True, debug=False)
        return (out["stats"], out["packed_y"], out["packed_z"])

    dt = timeit(run_enc, [(xf,) for xf in xs])
    print(f"{'whole device encode':44s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
