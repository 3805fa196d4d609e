"""Select (beta_rate, beta_vq) pairs per target rate by reconstruction
quality: score = alpha*PSNR - FID with alpha=2 (Eq. 13)
(ref: scripts/beta_selection.py:186-250).

Consumes binary_rate_search_results.json; for each target rate, reconstructs
the validation set at each candidate pair, scores, and emits
`beta_selection_results.csv` with the argmax per rate. Without InceptionV3
weights the FID term is omitted (flagged in the output).
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.metrics.fid import compute_fid, load_inception_features
from dc_vic_tpu.metrics.image import calc_psnr
from dc_vic_tpu.models import build_comp_model
from dc_vic_tpu.utils.config import load_config
from dc_vic_tpu.utils.logger import get_root_logger

ALPHA = 2.0


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--val_dir", type=str, required=True)
    p.add_argument("--search_results", type=str, required=True,
                   help="binary_rate_search_results.json")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--inception_weights", type=str, default=None)
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
    from compress import init_params
    params = init_params(spec, args.model_path)

    with open(args.search_results) as f:
        candidates = json.load(f)

    paths = sorted(glob(os.path.join(args.val_dir, "*.png"))
                   + glob(os.path.join(args.val_dir, "*.jpg")))[: args.max_images]
    imgs = np.stack([
        (np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0 - 0.5) * 2
        for p in paths])

    fwd = jax.jit(lambda p, x, b1, b2: module.apply(
        p, x, b1, b2, is_train=False)["fake_images"])

    feats_fn = load_inception_features(args.inception_weights)

    def reconstruct_all(beta_rate, beta_vq):
        """Full set — the remainder batch runs at its own shape instead of
        being dropped (scores must cover every validation image; one extra
        compile is noise for an offline sweep)."""
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)
        outs = []
        for i in range(0, len(imgs), args.batch_size):
            batch = imgs[i:i + args.batch_size]
            outs.append(np.asarray(fwd(params, jnp.asarray(batch), b1, b2)))
        return np.concatenate(outs, axis=0)

    def to_u8(x):
        return np.round((np.clip(x, -1, 1) / 2 + 0.5) * 255).astype(np.uint8)

    rows = []
    by_rate = defaultdict(list)
    for cand in candidates:
        fakes = reconstruct_all(cand["beta_rate"], cand["beta_vq"])
        n = len(fakes)
        psnr = float(np.mean([
            calc_psnr(imgs[i:i + 1], fakes[i:i + 1]) for i in range(n)]))
        fid = compute_fid([to_u8(x) for x in imgs[:n]],
                          [to_u8(x) for x in fakes], feats_fn)
        score = ALPHA * psnr - (fid if fid is not None else 0.0)
        row = dict(**cand, psnr=psnr, fid=fid, score=score,
                   fid_in_score=fid is not None)
        rows.append(row)
        by_rate[cand["target_rate"]].append(row)
        logger.info(f"rate={cand['target_rate']} beta_vq={cand['beta_vq']}: "
                    f"psnr={psnr:.3f} fid={fid} score={score:.3f}")

    for rate, cands in by_rate.items():
        best = max(cands, key=lambda r: r["score"])
        best["selected"] = True

    out = os.path.join(args.save_dir, "beta_selection_results.csv")
    with open(out, "w", newline="") as f:
        fieldnames = list(rows[0].keys()) + ["selected"]
        w = csv.DictWriter(f, fieldnames=fieldnames, extrasaction="ignore")
        w.writeheader()
        for r in rows:
            r.setdefault("selected", False)
            w.writerow(r)
    logger.info(f"wrote {out}")


if __name__ == "__main__":
    main()
