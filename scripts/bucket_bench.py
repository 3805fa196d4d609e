"""Mixed-resolution compression sweep: bucket-compile behavior on chip.

BASELINE config #4 is a DIV2K-style sweep (many raw resolutions, some
>1024px). The reference encodes image-by-image on CPU, so resolution
diversity costs it nothing; on TPU every distinct PADDED shape is a new
set of XLA executables. scripts/compress.py amortizes that with
plan_buckets (group by padded shape, batch within raw shape, biggest
first). This probe drives that exact machinery over a synthetic
DIV2K-style set and verifies the contract:

  * compile bursts == distinct padded buckets: the FIRST chunk of each
    padded bucket triggers XLA compilation ("Finished XLA compilation"
    events from jax's dispatch logger); every later chunk in the same
    bucket must trigger ZERO compilations (jit caches keyed on the
    padded shape — driver.py module docstring).
  * >1024px images route through the tiled encoder (codec/tiling.py)
    inside the same compress() surface, and their tile executables are
    shared — a second large bucket reuses them.

Per-bucket cold (compile-inclusive) and warm throughput land in a JSON
artifact (docs/artifacts/bucket_bench_r5.json with --artifacts).

Usage:
  real chip:   python scripts/bucket_bench.py --artifacts
  CPU check:   JAX_PLATFORMS=cpu python scripts/bucket_bench.py --tiny

Ref sweep shape: BASELINE.json configs[3]; reference behavior:
/root/reference/scripts/compress.py (per-image loop, no batching).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from compress import plan_buckets  # noqa: E402


class CompileCounter(logging.Handler):
    """Counts backend executable builds via jax's dispatch log line."""

    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            self.count += 1


def make_sweep(root: str, specs, seed: int = 0):
    """Synthetic DIV2K-style set: (width, height, count) per resolution.
    Smooth multi-scale content + noise (same recipe as bench.py)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    sizes = []
    uid = 0
    for w, h, n in specs:
        for _ in range(n):
            i, uid = uid, uid + 1
            yy, xx = np.meshgrid(np.linspace(0, 4, h), np.linspace(0, 4, w),
                                 indexing="ij")
            f1, f2, p = rng.uniform(0.5, 2.5, 3)
            img = (np.stack([np.sin(yy * f1 + p + k) * np.cos(xx * f2 + k)
                             for k in range(3)], -1) + 1) * 110
            img = np.clip(img + rng.normal(0, 10, (h, w, 3)),
                          0, 255).astype(np.uint8)
            path = os.path.join(root, f"im_{w}x{h}_{i}.png")
            Image.fromarray(img).save(path)
            sizes.append((path, (w, h)))
    return sizes


def build_codec(tiny: bool):
    import jax
    import jax.numpy as jnp

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config

    if tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tests"))
        from helpers import tiny_config
        spec = build_comp_model(tiny_config())
    else:
        repo = os.path.join(os.path.dirname(__file__), "..")
        cfg = load_config(os.path.join(repo, "config",
                                       "dc_vic_patchgan.yaml"))
        # same deployment mode as bench.py: bf16 conv stacks, entropy-
        # critical path pinned f32 (DCVICModel.codec_dtype)
        cfg["codec_dtype"] = "bfloat16"
        spec = build_comp_model(cfg)
    params = jax.jit(lambda r, d: spec.module.init(
        {"params": r}, d, jnp.array([1.0]), jnp.array([1.0]),
        is_train=False))(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return Codec(spec, params)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU plumbing validation)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--work", type=str, default="/tmp/bucket_bench")
    p.add_argument("--artifacts", action="store_true",
                   help="write docs/artifacts/bucket_bench_r5.json")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_log_compiles", True)

    if args.tiny:
        # scaled-down sweep: 4 raw shapes -> 3 padded buckets. 92x76 pads
        # into 96x80's (128,128) bucket at the same batch, so its chunk
        # must run entirely from cache (the padded-shape sharing contract).
        specs = [(96, 80, 3), (80, 64, 2), (160, 96, 2), (96, 80, 1),
                 (92, 76, 4)]
    else:
        # DIV2K-style: 5 raw shapes -> 4 padded buckets, one >1024px
        # (tiled path). 760x506 pads into 768x512's (512,768) bucket at
        # the same batch -> zero compiles for its chunk.
        specs = [(768, 512, 4), (760, 506, 4), (512, 384, 3),
                 (1020, 678, 2), (1536, 1020, 2)]
    sizes = make_sweep(os.path.join(args.work, "imgs"), specs)
    chunks, n_buckets = plan_buckets(sizes, args.batch_size)

    counter = CompileCounter()
    dispatch_log = logging.getLogger("jax._src.dispatch")
    dispatch_log.addHandler(counter)
    dispatch_log.setLevel(logging.WARNING)

    codec = build_codec(args.tiny)
    from PIL import Image

    def load_chunk(paths):
        return np.stack([np.asarray(Image.open(q).convert("RGB"), np.uint8)
                         for q in paths])

    per_bucket = {}
    compile_bursts = 0
    for chunk in chunks:
        imgs = load_chunk(chunk)
        key = f"{imgs.shape[1]}x{imgs.shape[2]}"
        before = counter.count
        t0 = time.perf_counter()
        res = codec.compress(imgs, quality_ind=1)
        dt = time.perf_counter() - t0
        compiled = counter.count - before
        if compiled:
            compile_bursts += 1
        b = per_bucket.setdefault(key, {
            "raw_hw": key, "n_imgs": 0, "cold_s": None, "warm_s": [],
            "compiles": 0, "bytes": 0})
        b["n_imgs"] += len(imgs)
        b["compiles"] += compiled
        b["bytes"] += sum(sum(len(s) for s in r["string_list"]) for r in res)
        if compiled:
            b["cold_s"] = dt
        else:
            b["warm_s"].append((dt, len(imgs)))
        print(f"chunk {key} x{len(imgs)}: {dt:.2f}s, "
              f"{compiled} XLA compiles")

    # one warm repeat per bucket so every bucket has a steady-state number
    bucket_streams = {}
    for chunk in chunks:
        imgs = load_chunk(chunk)
        key = f"{imgs.shape[1]}x{imgs.shape[2]}"
        before = counter.count
        t0 = time.perf_counter()
        res = codec.compress(imgs, quality_ind=1)
        dt = time.perf_counter() - t0
        assert counter.count == before, (
            f"repeat chunk {key} recompiled — jit cache miss on a warm "
            f"padded bucket")
        per_bucket[key]["warm_s"].append((dt, len(imgs)))
        bucket_streams.setdefault(key, [r["string_list"] for r in res])

    # decode side per bucket (r5: the >1024px tiled reconstruction was
    # rewritten device-resident — VERDICT r4 #6): cold, then warm
    for key, streams in bucket_streams.items():
        out = codec.decompress(streams)           # compile + warm caches
        t0 = time.perf_counter()
        out = codec.decompress(streams)
        dt = time.perf_counter() - t0
        per_bucket[key]["warm_dec"] = (dt, out.shape[0])

    rows = []
    for key, b in per_bucket.items():
        wt = sum(t for t, _ in b["warm_s"])
        wn = sum(n for _, n in b["warm_s"])
        dec = b.get("warm_dec")
        rows.append({
            "raw_hw": key, "n_imgs": b["n_imgs"],
            "xla_compiles": b["compiles"],
            "cold_s": round(b["cold_s"], 2) if b["cold_s"] else None,
            "warm_img_per_s": round(wn / wt, 3) if wt else None,
            "warm_dec_img_per_s": (round(dec[1] / dec[0], 3)
                                   if dec else None),
            "bpp_proxy_bytes": b["bytes"],
        })
    result = {
        "n_buckets_planned": n_buckets,
        "compile_bursts": compile_bursts,
        "total_images": sum(len(c) for c in chunks),
        "backend": jax.default_backend(),
        "model": "tiny" if args.tiny else "dc_vic_patchgan(random-init)",
        "buckets": rows,
    }
    print(json.dumps(result, indent=2))
    assert compile_bursts == n_buckets, (
        f"compile bursts ({compile_bursts}) != planned padded buckets "
        f"({n_buckets})")
    if args.artifacts:
        art = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "artifacts", "bucket_bench_r5.json")
        with open(art, "w") as f:
            json.dump(result, f, indent=2)
        print("wrote", art)
    print("bucket contract holds: first chunk per padded bucket compiles, "
          "repeats run from cache")


if __name__ == "__main__":
    main()
