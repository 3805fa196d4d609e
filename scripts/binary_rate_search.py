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


def bisect_beta_rate(avg_bpp_fn, target: float, max_beta_rate: float,
                     memo: dict, tol: float = TOL,
                     max_iters: int = MAX_ITERS):
    """Memoized bisection of beta_rate in [0, max_beta_rate] for an
    avg_bpp_fn that is monotone DECREASING in beta_rate (the rate
    condition: larger beta_rate -> lower bpp). Returns the best
    (beta_rate, bpp) pair seen — closest |bpp - target| — matching the
    reference's early-exit-at-tolerance loop (ref:
    scripts/binary_rate_search.py:126-176). `memo` is shared across
    targets so repeated probes of the same beta_rate reuse the model
    evaluation (keyed on the beta_rate only; callers pass one memo per
    beta_vq)."""
    lo, hi = 0.0, max_beta_rate
    best = None
    for _ in range(max_iters):
        mid = (lo + hi) / 2.0
        key = round(mid, 6)
        if key not in memo:
            memo[key] = avg_bpp_fn(mid)
        bpp = memo[key]
        if best is None or abs(bpp - target) < abs(best[1] - target):
            best = (mid, bpp)
        if abs(bpp - target) <= tol:
            break
        if bpp > target:
            lo = mid
        else:
            hi = mid
    return best


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--val_dir", type=str, required=True,
                   help="directory of pre-cropped validation images")
    p.add_argument("--vq_indices_dir", type=str, default=None,
                   help="directory of precomputed VQGAN token maps "
                        "(<name>.npy, from build_openimage_val_dataset.py); "
                        "skips the frozen VQGAN encode during the sweep "
                        "(ref: binary_rate_search.py:95-124 always uses "
                        "precomputed indices)")
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

    idx_maps = None
    if args.vq_indices_dir:
        from dc_vic_tpu.models.dc_vic import likelihood_to_bpp

        idx_maps = np.stack([
            np.load(os.path.join(
                args.vq_indices_dir,
                os.path.splitext(os.path.basename(p))[0] + ".npy"))
            .astype(np.int32) for p in paths])

        def _qbpp_from_vq(p, x, idx, b1, b2):
            # quantized latent == codebook lookup of the token map, so the
            # frozen VQGAN encoder never runs during the sweep
            lat = module.apply(p, idx, method=module.vq_indices_to_latent)
            y = module.apply(p, x, lat, idx, b1, b2,
                             method=module.comp_encode)
            ent = module.apply(p, y, is_train=False,
                               method=module.estimate_entropy)
            num_pixel = x.shape[0] * x.shape[1] * x.shape[2]
            return (likelihood_to_bpp(ent["q_likelihoods"]["y"], num_pixel)
                    + likelihood_to_bpp(ent["q_likelihoods"]["z"],
                                        num_pixel))
        fwd = jax.jit(_qbpp_from_vq)
    else:
        fwd = jax.jit(lambda p, x, b1, b2: module.apply(
            p, x, b1, b2, is_train=False)["qbpp"])

    def avg_bpp(beta_rate: float, beta_vq: float) -> float:
        """Image-weighted mean over the FULL validation set — the remainder
        batch is run at its own (smaller) shape rather than dropped, so the
        average matches the reference's full-set mean (ref:
        scripts/binary_rate_search.py:95-124). One extra compile for the
        remainder shape is noise for an offline calibration sweep."""
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)
        total, n = 0.0, 0
        for i in range(0, len(imgs), args.batch_size):
            batch = jnp.asarray(imgs[i:i + args.batch_size])
            if idx_maps is not None:
                v = fwd(params, batch,
                        jnp.asarray(idx_maps[i:i + args.batch_size]), b1, b2)
            else:
                v = fwd(params, batch, b1, b2)
            total += float(v) * batch.shape[0]
            n += batch.shape[0]
        return total / n

    results = []
    for beta_vq in args.beta_vq_list:
        memo = {}  # shared across this beta_vq's targets
        for target in args.target_rates:
            best = bisect_beta_rate(
                lambda br: avg_bpp(br, beta_vq), target, spec.max_beta_rate,
                memo)
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
