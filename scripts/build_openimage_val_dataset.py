"""Build the beta-calibration validation set: random 256x256 crops of
OpenImages validation images + offline VQGAN token maps saved as .npy
(uint8 for n_embed <= 256) (ref: scripts/build_openimage_val_dataset.py:101-191).
"""
from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.utils.config import load_config
from dc_vic_tpu.utils.logger import get_root_logger


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True,
                   help="model config (for the frozen VQGAN)")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--src_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--num_images", type=int, default=2048)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=16)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    args = parse_args()
    logger = get_root_logger()
    img_dir = os.path.join(args.save_dir, "images")
    idx_dir = os.path.join(args.save_dir, "vq_indices")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(idx_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    paths = sorted(glob(os.path.join(args.src_dir, "*.jpg"))
                   + glob(os.path.join(args.src_dir, "*.png")))
    rng.shuffle(paths)

    opt = load_config(args.config_path)
    spec = build_comp_model(opt)
    module = spec.module
    from compress import init_params
    params = init_params(spec, args.model_path)
    vq_fn = jax.jit(lambda p, x: module.apply(p, x, method=module.vq_encode))

    crops, names = [], []
    count = 0
    for p in paths:
        if count >= args.num_images:
            break
        try:
            img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        except Exception:
            continue
        H, W = img.shape[:2]
        if H < args.crop or W < args.crop:
            continue
        t = rng.integers(0, H - args.crop + 1)
        l = rng.integers(0, W - args.crop + 1)
        crop = img[t:t + args.crop, l:l + args.crop]
        name = f"val_{count:05d}"
        Image.fromarray(crop).save(os.path.join(img_dir, f"{name}.png"))
        crops.append((crop.astype(np.float32) / 255.0 - 0.5) * 2.0)
        names.append(name)
        count += 1

        if len(crops) == args.batch_size or count == args.num_images:
            _flush_tokens(vq_fn, params, module, crops, names, idx_dir)
            crops, names = [], []

    if crops:
        # source exhausted before num_images: flush the partial batch too
        # (every saved crop must get its token map)
        _flush_tokens(vq_fn, params, module, crops, names, idx_dir)

    logger.info(f"wrote {count} crops + token maps to {args.save_dir}")


def _flush_tokens(vq_fn, params, module, crops, names, idx_dir):
    import jax.numpy as jnp
    _, idx = vq_fn(params, jnp.asarray(np.stack(crops)))
    idx = np.asarray(idx)
    dtype = np.uint8 if module.n_embed <= 256 else np.int32
    for nm, ix in zip(names, idx):
        np.save(os.path.join(idx_dir, f"{nm}.npy"), ix.astype(dtype))


if __name__ == "__main__":
    main()
