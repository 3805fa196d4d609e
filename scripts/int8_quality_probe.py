"""Quantify what DCVIC_INT8_CONV costs in pixels (on the real chip).

The int8 dispatch (nn/layers.py::Int8Conv3, docs/PERF.md section 10) only
ever touches convs whose `precision is None` — the entropy-parameter path
is excluded by construction — so streams stay decodable across the gate.
This probe measures the two effects that remain:

1. recon delta: decode the SAME streams with the default path and the
   int8 path; PSNR between the two reconstructions isolates the pure
   quantization error of the synthesis/VQGAN stacks (identical y_hat —
   asserted).
2. encode delta: the analysis transforms also qualify for int8, which
   perturbs y and therefore the coded symbols. Reported as the stream
   size delta (the streams are self-consistent either way; the codec's
   integrity checks run on every decode here).

PRNG weights (untrained) make PSNR-vs-source meaningless; the honest
quality statement is recon-vs-recon at identical latents, which is
exactly what a deployed int8 decoder changes.

Usage (real chip): python scripts/int8_quality_probe.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
H, W = 768, 512


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "dc_vic_patchgan.yaml"))
    cfg["codec_dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    spec = build_comp_model(cfg)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: spec.module.init(
        {"params": r}, jnp.zeros((1, 256, 256, 3)), b, b,
        is_train=False))(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(0, 4, H), np.linspace(0, 4, W),
                         indexing="ij")
    base = (np.stack([np.sin(yy + p) * np.cos(xx * 0.7 + p)
                      for p in (0.0, 1.3, 2.1)], axis=-1) + 1.0) * 110.0
    imgs = np.clip(base[None] + rng.normal(0, 12, (BATCH, H, W, 3)),
                   0, 255).astype(np.uint8)

    os.environ.pop("DCVIC_INT8_CONV", None)
    codec_ref = Codec(spec, params)
    res_ref = codec_ref.compress(imgs, quality_ind=0)
    out_ref = codec_ref.decompress([r["string_list"] for r in res_ref])
    ref_bytes = sum(sum(len(s) for s in r["string_list"]) for r in res_ref)

    os.environ["DCVIC_INT8_CONV"] = "1"
    codec_i8 = Codec(spec, params)
    # same streams, int8 reconstruction: pure recon quantization error
    out_i8 = codec_i8.decompress([r["string_list"] for r in res_ref])
    cross = psnr(out_ref, out_i8)
    # full int8 roundtrip: analysis also quantized -> different streams
    res_i8 = codec_i8.compress(imgs, quality_ind=0)
    i8_bytes = sum(sum(len(s) for s in r["string_list"]) for r in res_i8)
    out_i8_full = codec_i8.decompress([r["string_list"] for r in res_i8])
    full = psnr(out_ref, out_i8_full)

    print(f"batch {BATCH} @ {H}x{W}, codec_dtype={cfg['codec_dtype']}")
    print(f"recon-only int8 (same streams):   PSNR vs default "
          f"{cross:6.2f} dB, max|diff| "
          f"{np.max(np.abs(out_ref.astype(int) - out_i8.astype(int)))}")
    print(f"full int8 roundtrip:              PSNR vs default "
          f"{full:6.2f} dB")
    print(f"stream bytes: default {ref_bytes}, int8-analysis {i8_bytes} "
          f"({100.0 * (i8_bytes - ref_bytes) / ref_bytes:+.2f}%)")


if __name__ == "__main__":
    main()
