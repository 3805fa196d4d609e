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


def run_curriculum(args, repo, train_root, eval_root):
    """Full 4-stage curriculum chained ON THE CHIP (VERDICT r4 #8), at soak
    scale, with the REAL cross-exp load_checkpoint knobs exercised at each
    of the three handoffs (ref: config/exp1_stage1_2.yaml:6-13,
    dual_cond_gan_distortion_vq_code_trainer.py:348-431):

      s1 stage1_1-style: non-beta HyperpriorCharmVicModel, ElicVqCatSc
         encoder + ElicFeatFusionDecoder, RateDistortionVqCodeTrainer.
         Gate: eval RD objective J improves first -> last.
      s2 stage1_2-style: dual-beta model; handoff loads s1 with
         strict=False (cross-ARCHITECTURE partial restore: the shared
         hyper/context/estimator/fusion subtrees carry over, the new
         beta-FiLM encoder/decoder start fresh), load_optimizer=False.
         Gates: corner J improves; beta corners ordered sanely (higher
         beta_rate corner emits fewer bpp).
      s3 stage1_3-style GAN: handoff loads s2 strict=True,
         load_optimizer=False, load_discriminator=False (fresh D).
         Gates: zero NaN-skips, d_loss in (0.05, 3), corner PSNR within
         1.5 dB of s2, corner bpp within 10% (entropy path frozen).
      s4 stage3-style GAN: selected beta pairs on; handoff loads s3 with
         load_optimizer=True + new_g_lr=5e-5 + load_discriminator=True
         (warm D) + strict=True. Gates: zero NaN-skips, d_loss sane,
         corner PSNR within 1.0 dB of s3.
    """
    import csv
    import json

    from dc_vic_tpu.train.trainer import build_trainer
    from dc_vic_tpu.utils.config import load_config
    from dc_vic_tpu.utils.paths import PathHandler

    cfg_path = args.config or os.path.join(repo, "docs", "artifacts",
                                           "soak_gan_config.yaml")
    iters, ev = args.iters, args.eval_step
    art = os.path.join(repo, "docs", "artifacts", "curriculum_r5")
    os.makedirs(art, exist_ok=True)
    verdict = {"iters_per_stage": iters, "stages": {}, "gates": {}}

    def base_opt(exp):
        opt = load_config(cfg_path, is_train=True)
        opt["exp"] = exp
        opt["ckpt_root"] = os.path.join(args.work, "checkpoint")
        opt["total_iter"] = iters
        opt["eval_step"] = ev
        opt["save_step"] = iters
        opt["keep_step"] = [iters]
        opt["log_step"] = min(25, max(1, iters // 4))
        opt["dataset"]["train_dataset"]["root_dir"] = train_root
        opt["dataset"]["eval_dataset"]["root_dir"] = eval_root
        return opt

    def run(opt):
        paths = PathHandler(opt["ckpt_root"], opt["exp"])
        paths.make_job_dir()
        build_trainer(opt).train_loop()
        with open(paths.eval_csv_path) as f:
            erows = [r for r in csv.DictReader(f)]
        with open(paths.loss_csv_path) as f:
            lrows = [r for r in csv.DictReader(f)]
        if not args.no_artifacts:
            shutil.copy(paths.eval_csv_path,
                        os.path.join(art, f"{opt['exp']}_eval.csv"))
            shutil.copy(paths.loss_csv_path,
                        os.path.join(art, f"{opt['exp']}_loss.csv"))
        return paths, erows, lrows

    def corner(rows, which="max"):
        """Rows at the (max,max) (or (min,min)) beta corner; rows without
        beta columns (stage 1) pass through."""
        if not rows or "beta_rate" not in rows[0]:
            return rows
        betas = sorted({(float(r["beta_rate"]), float(r["beta_vq"]))
                        for r in rows})
        pick = betas[-1] if which == "max" else betas[0]
        return [r for r in rows
                if (float(r["beta_rate"]), float(r["beta_vq"])) == pick]

    # ---------------- s1: stage1_1-style (non-beta RD) -------------------
    o1 = base_opt("cur_s1")
    o1["trainer"] = {"type": "RateDistortionVqCodeTrainer"}
    o1["model"] = {"type": "HyperpriorCharmVicModel",
                   "enc_vq_input": "onehot_indices"}
    o1["subnet"]["encoder"] = {
        "type": "ElicVqCatScEncoder", "in_ch": 3, "out_ch": 96,
        "main_ch": 64, "block_mid_ch": 32, "input_feat_ch": 260,
        "proj_init": False}
    o1["subnet"]["decoder"] = {
        "type": "ElicFeatFusionDecoder", "in_ch": 96, "out_ch": 3,
        "main_ch": 64, "block_mid_ch": 32, "use_tanh": False,
        "feat_layer_name": "block1",
        "fusion_layer_dict": {"block1": "block_1_8", "block2": "block_1_4",
                              "block3": "block_1_2"}}
    p1, e1, _ = run(o1)
    j1 = [rd_objective(float(r["bpp"]), float(r["psnr"])) for r in e1]
    verdict["stages"]["s1"] = {"J": [round(j, 4) for j in j1]}
    verdict["gates"]["s1_J_improves"] = bool(j1[-1] < j1[0])
    print(f"s1 J: {j1[0]:.4f} -> {j1[-1]:.4f}", flush=True)

    # ---------------- s2: stage1_2-style (dual-beta RD) ------------------
    o2 = base_opt("cur_s2")
    o2["load_checkpoint"] = {
        "path": p1.checkpoint_path("comp_model", iters),
        "load_optimizer": False, "load_scheduler": False,
        "strict": False,  # cross-architecture partial restore
    }
    p2, e2, _ = run(o2)
    cmax = corner(e2, "max")
    cmin = corner(e2, "min")
    j2 = [rd_objective(float(r["bpp"]), float(r["psnr"])) for r in cmax]
    bpp_hi = float(cmax[-1]["bpp"])
    bpp_lo = float(cmin[-1]["bpp"])
    s2_psnr, s2_bpp = float(cmax[-1]["psnr"]), bpp_hi
    verdict["stages"]["s2"] = {
        "corner_J": [round(j, 4) for j in j2],
        "bpp_maxbeta": bpp_hi, "bpp_minbeta": bpp_lo}
    verdict["gates"]["s2_corner_J_improves"] = bool(j2[-1] < j2[0])
    # exp(beta_rate) rate weighting: the high-beta corner must emit fewer
    # bits (small tolerance for soak-scale noise)
    verdict["gates"]["s2_beta_corners_ordered"] = \
        bool(bpp_hi <= bpp_lo * 1.05)
    print(f"s2 corner J: {j2[0]:.4f} -> {j2[-1]:.4f}; "
          f"bpp hi/lo corner {bpp_hi:.4f}/{bpp_lo:.4f}", flush=True)

    # ---------------- s3: stage1_3-style GAN -----------------------------
    o3 = base_opt("cur_s3")
    o3["trainer"] = {"type": "DualBetaCondGanDistortionVqCodeTrainer"}
    o3["loss"] = {k: v for k, v in dict(o3["loss"]).items()
                  if k != "rate_loss"}
    o3["loss"]["gan_loss"] = {"type": "VanillaGANLoss", "loss_weight": 0.01}
    o3["load_checkpoint"] = {
        "path": p2.checkpoint_path("comp_model", iters),
        "load_optimizer": False, "load_scheduler": False,
        "load_discriminator": False, "strict": True,
    }
    p3, e3, l3 = run(o3)
    c3 = corner(e3, "max")
    s3_skip = sum(float(r.get("skipped") or 0) for r in l3)
    s3_d = float(l3[-1]["d_loss"])
    s3_psnr, s3_bpp = float(c3[-1]["psnr"]), float(c3[-1]["bpp"])
    verdict["stages"]["s3"] = {"d_loss": s3_d, "skipped": s3_skip,
                               "psnr": s3_psnr, "bpp": s3_bpp}
    verdict["gates"].update(
        s3_zero_nan_skips=bool(s3_skip == 0),
        s3_d_loss_sane=bool(np.isfinite(s3_d) and 0.05 < s3_d < 3.0),
        s3_psnr_holds=bool(s3_psnr >= s2_psnr - 1.5),
        s3_bpp_frozen=bool(abs(s3_bpp - s2_bpp)
                           <= 0.10 * max(s2_bpp, 1e-6)))
    print(f"s3 d_loss={s3_d:.4f} skipped={s3_skip:.0f} "
          f"psnr={s3_psnr:.2f} (s2 {s2_psnr:.2f}) bpp={s3_bpp:.4f}",
          flush=True)

    # ---------------- s4: stage3-style GAN (selected pairs) --------------
    o4 = base_opt("cur_s4")
    o4["trainer"] = {"type": "DualBetaCondGanDistortionVqCodeTrainer"}
    o4["loss"] = dict(o3["loss"])
    o4["model"] = dict(o4["model"])
    o4["model"]["use_selected_beta_pairs"] = True
    o4["model"]["selected_beta_rate"] = [2.29, 1.51, 1.12, 0.62, 0.16]
    o4["model"]["selected_beta_vq"] = [3.00, 2.25, 2.00, 1.50, 1.00]
    o4["load_checkpoint"] = {
        "path": p3.checkpoint_path("comp_model", iters),
        "load_optimizer": True, "load_scheduler": False,
        "load_discriminator": True, "new_g_lr": 5e-5, "new_d_lr": 5e-5,
        "strict": True,
    }
    _, e4, l4 = run(o4)
    c4 = corner(e4, "max")
    s4_skip = sum(float(r.get("skipped") or 0) for r in l4)
    s4_d = float(l4[-1]["d_loss"])
    s4_psnr = float(c4[-1]["psnr"])
    verdict["stages"]["s4"] = {"d_loss": s4_d, "skipped": s4_skip,
                               "psnr": s4_psnr}
    verdict["gates"].update(
        s4_zero_nan_skips=bool(s4_skip == 0),
        s4_d_loss_sane=bool(np.isfinite(s4_d) and 0.05 < s4_d < 3.0),
        s4_psnr_holds=bool(s4_psnr >= s3_psnr - 1.0))
    print(f"s4 d_loss={s4_d:.4f} skipped={s4_skip:.0f} "
          f"psnr={s4_psnr:.2f} (s3 {s3_psnr:.2f})", flush=True)

    print("curriculum gates:", verdict["gates"], flush=True)
    if not args.no_artifacts:
        with open(os.path.join(art, "verdict.json"), "w") as f:
            json.dump(verdict, f, indent=1)
    if not args.keep_work:
        shutil.rmtree(args.work, ignore_errors=True)
    if not all(verdict["gates"].values()):
        raise SystemExit(f"CURRICULUM GATES FAILED: {verdict['gates']}")
    print("curriculum soak gates passed")


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
    p.add_argument("--curriculum", action="store_true",
                   help="run the full 4-stage curriculum chain "
                        "(s1 RD -> s2 dual-beta -> s3 GAN -> s4 selected-"
                        "pairs GAN) with real handoff knobs at each stage")
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

    if args.curriculum:
        run_curriculum(args, repo, train_root, eval_root)
        return
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
