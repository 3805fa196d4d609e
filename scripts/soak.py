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


def run_gan_soak(args, repo, train_root, eval_root):
    """Two-phase curriculum soak (docs/artifacts/soak_gan_config.yaml):
    phase 1 trains the dual-beta model stage1_2-style; phase 2 cross-exp
    loads it into a stage1_3-style GAN fine-tune (frozen entropy path,
    DualBetaCond PatchGAN). Gates:
      - phase 2 runs with ZERO NaN-skips,
      - d_loss ends finite inside (0.05, 3.0) (vanilla-GAN equilibrium is
        2*ln2 ~ 1.386; ~0 = D collapse, large = divergence),
      - eval PSNR at the (max,max) beta corner degrades < 1.5 dB vs the
        phase-1 handoff point,
      - bpp at that corner moves < 10% (the entropy path is frozen; only
        the aux quantile updates can drift the z rate).
    """
    import csv

    from dc_vic_tpu.train.trainer import build_trainer
    from dc_vic_tpu.utils.config import load_config
    from dc_vic_tpu.utils.paths import PathHandler

    cfg_path = args.config or os.path.join(repo, "docs", "artifacts",
                                           "soak_gan_config.yaml")
    iters = args.iters
    corner_key = None  # filled from the eval csv (max beta corner)

    def corner_rows(eval_csv):
        with open(eval_csv) as f:
            rows = [r for r in csv.DictReader(f)]
        betas = sorted({(float(r["beta_rate"]), float(r["beta_vq"]))
                        for r in rows})
        bmax = betas[-1]
        return [r for r in rows
                if (float(r["beta_rate"]), float(r["beta_vq"])) == bmax]

    # ---------------- phase 1: dual-beta RD ----------------
    opt = load_config(cfg_path, is_train=True)
    opt["ckpt_root"] = os.path.join(args.work, "checkpoint")
    opt["total_iter"] = iters
    opt["eval_step"] = args.eval_step
    opt["save_step"] = iters
    opt["keep_step"] = [iters]
    opt["dataset"]["train_dataset"]["root_dir"] = train_root
    opt["dataset"]["eval_dataset"]["root_dir"] = eval_root
    p1_paths = PathHandler(opt["ckpt_root"], opt["exp"])
    p1_paths.make_job_dir()
    build_trainer(opt).train_loop()
    p1 = corner_rows(p1_paths.eval_csv_path)[-1]
    p1_psnr, p1_bpp = float(p1["psnr"]), float(p1["bpp"])
    print(f"phase 1 handoff (max-beta corner): psnr={p1_psnr:.2f} "
          f"bpp={p1_bpp:.4f}")

    # ---------------- phase 2: GAN fine-tune, cross-exp load -------------
    opt2 = load_config(cfg_path, is_train=True)
    opt2["exp"] = "soak_gan_p2"
    opt2["ckpt_root"] = os.path.join(args.work, "checkpoint")
    opt2["total_iter"] = iters
    opt2["eval_step"] = args.eval_step
    opt2["save_step"] = iters
    opt2["keep_step"] = [iters]
    opt2["dataset"]["train_dataset"]["root_dir"] = train_root
    opt2["dataset"]["eval_dataset"]["root_dir"] = eval_root
    opt2["trainer"] = {"type": "DualBetaCondGanDistortionVqCodeTrainer"}
    loss2 = {k: v for k, v in dict(opt2["loss"]).items() if k != "rate_loss"}
    loss2["gan_loss"] = {"type": "VanillaGANLoss", "loss_weight": 0.01}
    opt2["loss"] = loss2
    opt2["load_checkpoint"] = {
        "path": p1_paths.checkpoint_path("comp_model", iters),
        "load_optimizer": False, "load_scheduler": False,
        "load_discriminator": False, "strict": True,
    }
    p2_paths = PathHandler(opt2["ckpt_root"], opt2["exp"])
    p2_paths.make_job_dir()
    build_trainer(opt2).train_loop()

    # ---------------- gates ----------------
    with open(p2_paths.loss_csv_path) as f:
        lrows = [r for r in csv.DictReader(f)]
    skipped = sum(float(r.get("skipped") or 0) for r in lrows)
    d_last = float(lrows[-1]["d_loss"])
    p2 = corner_rows(p2_paths.eval_csv_path)[-1]
    p2_psnr, p2_bpp = float(p2["psnr"]), float(p2["bpp"])

    print(f"phase 2 end: d_loss={d_last:.4f} skipped={skipped:.0f} "
          f"psnr={p2_psnr:.2f} (phase1 {p1_psnr:.2f}) "
          f"bpp={p2_bpp:.4f} (phase1 {p1_bpp:.4f})")
    gates = {
        "zero_nan_skips": skipped == 0,
        "d_loss_sane": np.isfinite(d_last) and 0.05 < d_last < 3.0,
        "psnr_holds": p2_psnr >= p1_psnr - 1.5,
        "bpp_frozen": abs(p2_bpp - p1_bpp) <= 0.10 * max(p1_bpp, 1e-6),
    }
    print("gates:", gates)

    if not args.no_artifacts:
        art = os.path.join(repo, "docs", "artifacts")
        shutil.copy(p2_paths.eval_csv_path,
                    os.path.join(art, "soak_gan_eval.csv"))
        shutil.copy(p2_paths.loss_csv_path,
                    os.path.join(art, "soak_gan_loss.csv"))
        with open(os.path.join(art, "soak_gan_verdict.txt"), "w") as f:
            f.write(f"phase1: psnr={p1_psnr:.2f} bpp={p1_bpp:.4f}\n"
                    f"phase2: psnr={p2_psnr:.2f} bpp={p2_bpp:.4f} "
                    f"d_loss={d_last:.4f} skipped={skipped:.0f}\n"
                    f"gates: {gates}\n")
    if not args.keep_work:
        shutil.rmtree(args.work, ignore_errors=True)
    if not all(gates.values()):
        raise SystemExit(f"GAN SOAK GATES FAILED: {gates}")
    print("gan soak gates passed")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--eval_step", type=int, default=500)
    p.add_argument("--work", type=str, default="/tmp/soak_r3")
    p.add_argument("--keep_work", action="store_true")
    p.add_argument("--gan", action="store_true",
                   help="run the two-phase RD->GAN curriculum soak "
                        "(docs/artifacts/soak_gan_config.yaml) instead of "
                        "the stage1_1 RD soak")
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

    if args.gan:
        run_gan_soak(args, repo, train_root, eval_root)
        return

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
