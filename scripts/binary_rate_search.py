"""Binary search for beta_rate values hitting target bitrates
(ref: scripts/binary_rate_search.py:95-176).

For each (beta_vq, target_rate) pair: bisect beta_rate in [0, max_beta_rate]
(<= 10 iterations, memoized, +/-0.001 bpp tolerance) using the ESTIMATED
(quantized-likelihood) bpp over a pre-cropped validation set. Results go to
`binary_rate_search_results.json`.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.utils.config import load_config
from dc_vic_tpu.utils.logger import get_root_logger

TOL = 0.001
MAX_ITERS = 10


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--val_dir", type=str, required=True,
                   help="directory of pre-cropped validation images")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--target_rates", type=float, nargs="+",
                   default=[0.05, 0.075, 0.1, 0.125, 0.15])
    p.add_argument("--beta_vq_list", type=float, nargs="+",
                   default=[1.0, 1.5, 2.0, 2.5, 3.0, 3.5])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_images", type=int, default=256)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    args = parse_args()
    logger = get_root_logger()
    os.makedirs(args.save_dir, exist_ok=True)

    opt = load_config(args.config_path)
    spec = build_comp_model(opt)
    module = spec.module

    from compress import init_params  # reuse checkpoint loading
    params = init_params(spec, args.model_path)

    paths = sorted(glob(os.path.join(args.val_dir, "*.png"))
                   + glob(os.path.join(args.val_dir, "*.jpg")))[: args.max_images]
    if not paths:
        raise SystemExit(f"no images in {args.val_dir}")
    imgs = np.stack([
        (np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0 - 0.5) * 2
        for p in paths])

    fwd = jax.jit(lambda p, x, b1, b2: module.apply(
        p, x, b1, b2, is_train=False)["qbpp"])

    def avg_bpp(beta_rate: float, beta_vq: float) -> float:
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)
        vals = []
        for i in range(0, len(imgs), args.batch_size):
            batch = imgs[i:i + args.batch_size]
            if len(batch) < args.batch_size:
                break
            vals.append(float(fwd(params, jnp.asarray(batch), b1, b2)))
        return float(np.mean(vals))

    memo = {}
    results = []
    for beta_vq in args.beta_vq_list:
        for target in args.target_rates:
            lo, hi = 0.0, spec.max_beta_rate
            best = None
            for it in range(MAX_ITERS):
                mid = (lo + hi) / 2.0
                key = (round(mid, 6), beta_vq)
                if key not in memo:
                    memo[key] = avg_bpp(mid, beta_vq)
                bpp = memo[key]
                best = (mid, bpp)
                if abs(bpp - target) <= TOL:
                    break
                # larger beta_rate -> lower bpp (rate condition)
                if bpp > target:
                    lo = mid
                else:
                    hi = mid
            results.append(dict(beta_vq=beta_vq, target_rate=target,
                                beta_rate=best[0], achieved_bpp=best[1]))
            logger.info(f"beta_vq={beta_vq} target={target}: "
                        f"beta_rate={best[0]:.4f} bpp={best[1]:.5f}")

    out = os.path.join(args.save_dir, "binary_rate_search_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    logger.info(f"wrote {out}")


if __name__ == "__main__":
    main()
