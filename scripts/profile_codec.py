"""Per-stage codec profiler: prints a wall-time breakdown of the full
compress->decompress pipeline on the current backend, optionally capturing a
jax.profiler device trace (--trace_dir).

Usage: python scripts/profile_codec.py --config_path config/dc_vic_patchgan.yaml \
           [--model_path ckpt] [--batch 8] [--height 768] [--width 512]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--trace_dir", type=str, default=None)
    p.add_argument("--stream_format", type=str, default="tpu",
                   choices=["tpu", "compressai"])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from compress import init_params
    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config
    from dc_vic_tpu.utils.logger import get_root_logger
    from dc_vic_tpu.utils.profiling import StageTimer, device_trace, sync

    logger = get_root_logger()
    opt = load_config(args.config_path)
    spec = build_comp_model(opt)
    params = init_params(spec, args.model_path)
    codec = Codec(spec, params, stream_format=args.stream_format)

    B, H, W = args.batch, args.height, args.width
    imgs = np.random.default_rng(0).integers(0, 256, (B, H, W, 3),
                                             dtype=np.uint8)
    q = 0 if spec.selected_beta_rate else None
    kw = ({"quality_ind": 0} if spec.selected_beta_rate
          else {"beta_rate": 1.0, "beta_vq": 1.0})

    # warm / compile
    res = codec.compress(imgs, **kw)
    out = codec.decompress([r["string_list"] for r in res])

    timer = StageTimer()
    ctx = device_trace(args.trace_dir) if args.trace_dir else _null()
    with ctx:
        for _ in range(args.rounds):
            with timer.stage("1_device_encode+sym_d2h"):
                handle = codec.compress_dispatch(imgs, **kw)
                res_out = handle["out"]
                k = "sym_plane" if "sym_plane" in res_out else "stats"
                _ = np.asarray(res_out[k])
            with timer.stage("2_host_rans_encode"):
                res = codec.compress_finalize(handle)
            strings = [r["string_list"] for r in res]
            with timer.stage("3_decode_z+hyper+charm+recon"):
                pending = codec.decompress(strings, defer_fetch=True)
            with timer.stage("4_image_d2h"):
                _ = pending.fetch()
    timer.log(logger)
    total = sum(v["mean_sec"] for v in timer.report().values())
    logger.info(f"end-to-end: {total:.3f}s / batch -> {B / total:.2f} img/s")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
