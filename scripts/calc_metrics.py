"""Offline evaluation suite: PSNR / MS-SSIM / FID(HiFiC) / LPIPS / DISTS
(ref: scripts/calc_metrics.py — threaded per-image PSNR, HiFiC 256-patch FID
with two offset tilings, LPIPS(alex) on [-1,1], DISTS on [0,1], writes
`_metrics.json` next to the reconstructions).

Perceptual-net weights are optional CLI inputs (not distributable); metrics
without weights report null and are listed in `skipped`.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from glob import glob

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.metrics.image import calc_ms_ssim, calc_psnr
from dc_vic_tpu.utils.logger import get_root_logger


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", type=str, required=True)
    p.add_argument("--fake_dir", type=str, required=True,
                   help="reconstructions (+ _avg_bitrate.json) directory")
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--lpips_net", type=str, default="alex")
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--dists_weights", type=str, default=None)
    return p.parse_args()


def load_pair(real_path: str, fake_path: str):
    r = np.asarray(Image.open(real_path).convert("RGB"), np.uint8)
    f = np.asarray(Image.open(fake_path).convert("RGB"), np.uint8)
    assert r.shape == f.shape, f"{real_path} vs {fake_path}: {r.shape} != {f.shape}"
    return r, f


def to_pm1(u8: np.ndarray) -> np.ndarray:
    return (u8.astype(np.float32) / 255.0 - 0.5) * 2.0


def main():
    from dc_vic_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    args = parse_args()
    logger = get_root_logger()

    fake_paths = sorted(glob(os.path.join(args.fake_dir, "*.png")))
    pairs = []
    for fp in fake_paths:
        rp = os.path.join(args.real_dir, os.path.basename(fp))
        if os.path.exists(rp):
            pairs.append((rp, fp))
    if not pairs:
        raise SystemExit("no matching real/fake image pairs")
    logger.info(f"{len(pairs)} image pairs")

    # bitrate from the compress run (ref: retrieve_bitrate)
    bitrate = None
    avg_json = os.path.join(args.fake_dir, "_avg_bitrate.json")
    if os.path.exists(avg_json):
        with open(avg_json) as f:
            bitrate = json.load(f).get("avg_bpp")

    # PSNR / MS-SSIM: threaded per-image, averaged (ref: :136-145)
    def score(pair):
        r, f = load_pair(*pair)
        rr, ff = to_pm1(r)[None], to_pm1(f)[None]
        return calc_psnr(rr, ff), calc_ms_ssim(rr, ff)

    with ThreadPoolExecutor(8) as pool:
        scores = list(pool.map(score, pairs))
    psnr = float(np.mean([s[0] for s in scores]))
    msssim_vals = [s[1] for s in scores if s[1] >= 0]
    ms_ssim = float(np.mean(msssim_vals)) if msssim_vals else None

    skipped = []
    lpips_val = dists_val = fid_val = None

    # LPIPS (inputs [-1, 1], per-image mean; ref: :LPIPS alex)
    from dc_vic_tpu.metrics.feature_nets import load_lpips
    lpips_fn = load_lpips(args.lpips_weights, args.lpips_net)
    if lpips_fn is None:
        skipped.append("lpips (no weights: pass --lpips_weights)")
    else:
        vals = []
        for rp, fp in pairs:
            r, f = load_pair(rp, fp)
            vals.append(float(np.mean(np.asarray(
                lpips_fn(to_pm1(r)[None], to_pm1(f)[None])))))
        lpips_val = float(np.mean(vals))

    # DISTS (inputs [0, 1])
    if args.dists_weights:
        import torch
        from dc_vic_tpu.metrics.feature_nets import DISTS, convert_vgg16_features
        sd = torch.load(args.dists_weights, map_location="cpu",
                        weights_only=False)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        import jax
        model = DISTS()
        params = {"params": {
            "backbone": convert_vgg16_features(sd, "vgg16.features")
            if any(k.startswith("vgg16") for k in sd)
            else convert_vgg16_features(sd),
            "alpha": np.concatenate([np.asarray(sd["alpha"]).reshape(-1)]),
            "beta": np.concatenate([np.asarray(sd["beta"]).reshape(-1)]),
        }}
        fn = jax.jit(lambda a, b: model.apply(params, a, b))
        vals = []
        for rp, fp in pairs:
            r, f = load_pair(rp, fp)
            vals.append(float(np.mean(np.asarray(fn(
                r[None].astype(np.float32) / 255.0,
                f[None].astype(np.float32) / 255.0)))))
        dists_val = float(np.mean(vals))
    else:
        skipped.append("dists (no weights: pass --dists_weights)")

    # FID: HiFiC 256-patch protocol (ref: :220-320); needs >= 50 images
    from dc_vic_tpu.metrics.fid import MIN_IMAGES, compute_fid, load_inception_features
    feats_fn = load_inception_features(args.inception_weights)
    if feats_fn is None:
        skipped.append("fid (no weights: pass --inception_weights)")
    elif len(pairs) < MIN_IMAGES:
        skipped.append(f"fid (needs >= {MIN_IMAGES} images, got {len(pairs)})")
    else:
        reals, fakes = [], []
        for rp, fp in pairs:
            r, f = load_pair(rp, fp)
            reals.append(r)
            fakes.append(f)
        fid_val = compute_fid(reals, fakes, feats_fn)

    out = {
        "bitrate": bitrate,
        "psnr": psnr,
        "ms_ssim": ms_ssim,
        "fid": fid_val,
        "lpips": lpips_val,
        "dists": dists_val,
        "num_images": len(pairs),
        "skipped": skipped,
    }
    out_path = os.path.join(args.fake_dir, "_metrics.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    logger.info(json.dumps(out))


if __name__ == "__main__":
    main()
