"""On-chip training soak with QUALITY gates (not just "no NaNs").

Round 2's soak demonstrated stable dynamics but its 2 eval points could not
distinguish RD progress from rate collapse. This runbook (a) generates a
synthetic OpenImages-layout dataset, (b) trains the mid-size stage1_1-style
config (docs/artifacts/soak_stage1_1_config.yaml) for --iters iterations
with an eval every --eval_step (>= 6 points), and (c) gates on the EVAL-SET
RD OBJECTIVE J = w_rate * bpp + w_dist * mse_01 (the training trade-off
itself, with mse_01 recovered from eval PSNR): J must improve from the
first to the last eval point and be non-increasing across >= 70% of steps.
A model whose rate collapses faster than distortion improves fails this
gate; one optimizing the actual RD objective passes. Curves + verdict land
in docs/artifacts/soak_r3_{loss,eval}.csv.

Usage (real chip): python scripts/soak.py [--iters 3000] [--eval_step 500]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W_RATE, W_DIST = 0.04, 50.0  # stage1_1 training weights (exp1_stage1_1)


def make_synthetic_dataset(root: str, n_train: int = 192, n_eval: int = 12,
                           size: int = 256, seed: int = 0):
    """OpenImages-layout synthetic data: smooth multi-scale content + noise
    (compressible, non-degenerate — same recipe as bench.py images)."""
    from PIL import Image
    rng = np.random.default_rng(seed)

    def img(h, w):
        yy, xx = np.meshgrid(np.linspace(0, 4, h), np.linspace(0, 4, w),
                             indexing="ij")
        f1, f2, p = rng.uniform(0.5, 2.5, 3)
        base = (np.stack([np.sin(yy * f1 + p * k) * np.cos(xx * f2 + k)
                          for k in range(3)], -1) + 1) * 110
        return np.clip(base + rng.normal(0, 10, (h, w, 3)),
                       0, 255).astype(np.uint8)

    tr = os.path.join(root, "openimage", "train_0")
    ev = os.path.join(root, "kodak")
    os.makedirs(tr, exist_ok=True)
    os.makedirs(ev, exist_ok=True)
    for i in range(n_train):
        Image.fromarray(img(size, size)).save(
            os.path.join(tr, f"img{i:04d}.jpg"), quality=92)
    for i in range(n_eval):
        Image.fromarray(img(size, size)).save(
            os.path.join(ev, f"kodim{i:02d}.png"))
    return os.path.join(root, "openimage"), ev


def rd_objective(bpp: float, psnr: float) -> float:
    mse_01 = 10.0 ** (-psnr / 10.0)  # PSNR on [0,1]-range images
    return W_RATE * bpp + W_DIST * mse_01


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--eval_step", type=int, default=500)
    p.add_argument("--work", type=str, default="/tmp/soak_r3")
    p.add_argument("--keep_work", action="store_true")
    p.add_argument("--config", type=str, default=None,
                   help="override the soak config (default: the committed "
                        "mid-size docs/artifacts/soak_stage1_1_config.yaml)")
    p.add_argument("--no_artifacts", action="store_true",
                   help="skip copying curves into docs/artifacts "
                        "(plumbing validation runs)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import yaml

    from dc_vic_tpu.train.trainer import build_trainer
    from dc_vic_tpu.utils.config import load_config
    from dc_vic_tpu.utils.logger import get_root_logger
    from dc_vic_tpu.utils.paths import PathHandler

    repo = os.path.join(os.path.dirname(__file__), "..")
    train_root, eval_root = make_synthetic_dataset(
        os.path.join(args.work, "datasets"))

    cfg_path = args.config or os.path.join(repo, "docs", "artifacts",
                                           "soak_stage1_1_config.yaml")
    opt = load_config(cfg_path, is_train=True)
    opt["exp"] = "soak_r3"
    opt["ckpt_root"] = os.path.join(args.work, "checkpoint")
    opt["total_iter"] = args.iters
    opt["eval_step"] = args.eval_step
    opt["save_step"] = args.iters
    opt["keep_step"] = [args.iters]
    opt["log_step"] = 25
    opt["dataset"]["train_dataset"]["root_dir"] = train_root
    opt["dataset"]["eval_dataset"]["root_dir"] = eval_root

    paths = PathHandler(opt["ckpt_root"], opt["exp"])
    paths.make_job_dir()
    logger = get_root_logger(paths.log_path)
    trainer = build_trainer(opt)
    trainer.train_loop()

    # ---- quality gate on the eval RD objective
    import csv
    with open(paths.eval_csv_path) as f:
        rows = [r for r in csv.DictReader(f)]
    assert len(rows) >= 6, f"need >= 6 eval points, got {len(rows)}"
    js = [rd_objective(float(r["bpp"]), float(r["psnr"])) for r in rows]
    steps_down = sum(b <= a + 1e-4 for a, b in zip(js, js[1:]))
    frac = steps_down / (len(js) - 1)
    improved = js[-1] < js[0]
    print(f"eval RD objective J (w_rate*bpp + w_dist*mse01): "
          f"{[round(j, 4) for j in js]}")
    print(f"J improved first->last: {improved} "
          f"({js[0]:.4f} -> {js[-1]:.4f}); "
          f"non-increasing steps: {frac:.0%}")

    if not args.no_artifacts:
        art = os.path.join(repo, "docs", "artifacts")
        shutil.copy(paths.eval_csv_path,
                    os.path.join(art, "soak_r3_eval.csv"))
        shutil.copy(paths.loss_csv_path,
                    os.path.join(art, "soak_r3_loss.csv"))
        with open(os.path.join(art, "soak_r3_verdict.txt"), "w") as f:
            f.write(f"J curve: {[round(j, 4) for j in js]}\n"
                    f"improved: {improved}, monotone_frac: {frac:.2f}\n")
    if not args.keep_work:
        shutil.rmtree(args.work, ignore_errors=True)
    if not (improved and frac >= 0.7):
        raise SystemExit("SOAK QUALITY GATE FAILED: eval RD objective did "
                         "not improve monotonically enough")
    print("soak quality gate passed")


if __name__ == "__main__":
    main()
