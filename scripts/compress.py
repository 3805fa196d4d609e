"""Compress (and optionally decompress) a directory of PNGs — the benchmark
path (ref: scripts/compress.py, CLI-compatible flags and outputs:
per-image .bin / .png, _bitrates.csv, _avg_bitrate.json).

TPU-first addition: images are grouped into identical-resolution buckets and
batched per bucket, so each padded shape compiles once and the chip runs full
batches (--batch_size).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
from collections import defaultdict
from glob import glob

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.codec.container import load_byte_strings, save_byte_strings
from dc_vic_tpu.codec.driver import Codec
from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.train.saver import Saver
from dc_vic_tpu.utils.config import load_config
from dc_vic_tpu.utils.logger import get_root_logger


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint (.ckpt flax msgpack or .pth.tar torch)")
    p.add_argument("--img_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("-q", "--quality", type=int, required=True)
    p.add_argument("--decompress", action="store_true")
    p.add_argument("--selfcheck", action="store_true",
                   help="verify decode-side latents match the encoder bit-exactly")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--portable", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="write batch-independent streams: any decoder "
                        "batch grouping reproduces the latents bit-exactly "
                        "(canonical per-image entropy parameters — the "
                        "reference's .bin files have this property, so it "
                        "is the CLI default; --no-portable couples the "
                        "stream to the encode batch for max throughput)")
    p.add_argument("--stream_format", type=str, default="tpu",
                   choices=["tpu", "compressai"],
                   help="tpu: device-coded streams (native, fastest); "
                        "compressai: reference-compatible host coding "
                        "whose entropy parameters run on the CPU platform "
                        "by default, so the .bin decodes bit-exactly on "
                        "any machine (docs/artifacts/cross_platform_r5."
                        "json)")
    p.add_argument("--params_backend", type=str, default=None,
                   choices=["cpu", "accel"],
                   help="platform for the entropy-parameter chain "
                        "(default: cpu for compressai — cross-platform "
                        "streams; accel for tpu)")
    return p.parse_args()


def plan_buckets(sizes, batch_size: int, stride: int = 64):
    """Group images into batched compression chunks.

    sizes: list of (path, (width, height)) as PIL reports them. Images are
    bucketed by PADDED shape (the codec reflect-pads to a multiple of
    `stride`, driver.py STRIDE, and jit caches key on the padded shape) —
    so e.g. 500x375 and 512x384 share one compiled bucket. Within a padded
    bucket, same-raw-resolution images are batched together (a compress()
    batch must share the exact raw shape); chunks never exceed batch_size.

    Returns (chunks, n_buckets): chunks is a list of lists of paths, each
    chunk same raw resolution; n_buckets counts DISTINCT PADDED shapes =
    the number of encode-graph compilations a sweep pays (the regression
    contract tested by tests/test_calibration.py and measured on chip by
    scripts/bucket_bench.py)."""
    pad = lambda v: -(-v // stride) * stride
    by_raw = defaultdict(list)
    for p, (w, h) in sizes:
        by_raw[(h, w)].append(p)
    padded = {(pad(h), pad(w)) for h, w in by_raw}
    chunks = []
    bs = max(1, batch_size)
    # deterministic order: biggest buckets first (compile the expensive
    # graphs up front), then path order within
    for (h, w) in sorted(by_raw, key=lambda s: (-s[0] * s[1], s)):
        paths = sorted(by_raw[(h, w)])
        chunks.extend(paths[i:i + bs] for i in range(0, len(paths), bs))
    return chunks, len(padded)


def load_image(path: str) -> np.ndarray:
    # uint8 straight through: the codec normalizes to [-1,1] on device
    # (same f32 op order as the reference's host transform).
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    if img.dtype != np.uint8:
        img = np.round((np.clip(img, -1, 1) / 2 + 0.5) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def init_params(spec, model_path):
    import jax
    import jax.numpy as jnp

    module = spec.module
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([0.0]) if module.use_beta else None
    if module.use_beta:
        init = lambda r: module.init({"params": r}, x, b, b, is_train=False)
    else:
        init = lambda r: module.init({"params": r}, x, is_train=False)

    if model_path and model_path.endswith((".pth", ".pth.tar", ".ckpt.torch")):
        from dc_vic_tpu.models.convert import load_torch_comp_model
        template = jax.eval_shape(init, jax.random.PRNGKey(0))
        return load_torch_comp_model(model_path, template, spec)
    params = jax.jit(init)(jax.random.PRNGKey(0))
    if model_path:
        params = Saver.load(model_path, jax.device_get(params))
    return params


def main():
    from dc_vic_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    args = parse_args()
    opt = load_config(args.config_path)
    logger = get_root_logger()
    os.makedirs(args.save_dir, exist_ok=True)

    paths = sorted(glob(os.path.join(args.img_dir, "*.png")))
    if not paths:
        raise SystemExit(f"no .png files in {args.img_dir}")

    spec = build_comp_model(opt)
    params = init_params(spec, args.model_path)
    codec = Codec(spec, params, stream_format=args.stream_format,
                  portable=args.portable,
                  params_backend=args.params_backend)

    # resolution buckets -> batched encode per bucket (see plan_buckets)
    sizes = []
    for p in paths:
        with Image.open(p) as im:
            sizes.append((p, im.size))
    chunks, n_buckets = plan_buckets(sizes, args.batch_size)
    logger.info(f"{len(paths)} images -> {len(chunks)} chunks, "
                f"{n_buckets} padded-shape buckets")

    rows = []
    for chunk in chunks:
        imgs = np.stack([load_image(p) for p in chunk])
        results = codec.compress(imgs, quality_ind=args.quality,
                                 debug=args.selfcheck)
        H, W = imgs.shape[1], imgs.shape[2]

        bin_paths = []
        for p, r in zip(chunk, results):
            name = os.path.basename(p)
            bin_path = os.path.join(args.save_dir,
                                    name.replace(".png", ".bin"))
            save_byte_strings(bin_path, r["string_list"])
            bin_paths.append(bin_path)
            nbytes = os.path.getsize(bin_path)
            sl = r["string_list"]
            rows.append({
                "img_name": name,
                "header_bit": len(sl[0]) * 8,
                "z_bit": len(sl[1]) * 8,
                "y_bit": len(sl[2]) * 8,
                "real_bit": nbytes * 8,
                "real_bpp": nbytes * 8 / (H * W),
                "pred_bpp": r["pred_y_bpp"] + r["pred_z_bpp"],
                "num_pixel": H * W,
            })
            logger.info(f"{name}: {nbytes * 8 / (H*W):.5f} bpp")

        if args.selfcheck:
            strings = [load_byte_strings(bp) for bp in bin_paths]
            ok = codec.verify_roundtrip(results, strings, (H, W))
            if not ok:
                raise SystemExit(
                    "SELFCHECK FAILED: decode-side latents diverge from "
                    "the encoder (non-deterministic device math?)")
            logger.info(f"selfcheck ok ({len(chunk)} images)")

        if args.decompress:
            strings = [load_byte_strings(bp) for bp in bin_paths]
            fakes = codec.decompress(strings)
            for p, fake in zip(chunk, fakes):
                save_image(os.path.join(args.save_dir,
                                        os.path.basename(p)), fake)

    csv_path = os.path.join(args.save_dir, "_bitrates.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    avg_bpp = float(np.mean([r["real_bpp"] for r in rows]))
    with open(os.path.join(args.save_dir, "_avg_bitrate.json"), "w") as f:
        json.dump({"avg_bpp": avg_bpp}, f)
    logger.info(f"avg_bpp: {avg_bpp:.5f}")


if __name__ == "__main__":
    main()
