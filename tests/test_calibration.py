"""Calibration-script tests (ref: scripts/binary_rate_search.py:95-176,
beta_selection.py:186-250, build_openimage_val_dataset.py:101-191).

Covers: the memoized bisection as a unit (stub monotone model), and all
three scripts as subprocesses on tiny synthetic data — including the
token-map .npy path end-to-end (build_openimage_val_dataset writes the
maps, binary_rate_search consumes them via --vq_indices_dir, skipping the
frozen VQGAN encode like the reference's precomputed-indices flow)."""
import json
import os
import sys

import pytest

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from test_cli import cli_env, run_cli, synth_image, write_tiny_yaml  # noqa: E402

# Compile-heavy (subprocess / portable-matrix / mesh) — excluded from the
# dev profile `pytest -m 'not slow'` (VERDICT r4 #9); CI runs everything.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


# ---------------------------------------------------------------- unit
def test_bisect_beta_rate_converges_memoizes_and_hits_tolerance():
    from binary_rate_search import bisect_beta_rate

    calls = []

    def bpp(beta):  # monotone decreasing, like the rate condition
        calls.append(beta)
        return 2.0 * np.exp(-1.1 * beta)

    memo = {}
    beta, achieved = bisect_beta_rate(bpp, target=0.25, max_beta_rate=8.0,
                                      memo=memo, tol=1e-4, max_iters=30)
    # converged to the analytic solution beta = ln(8)/1.1
    assert abs(achieved - 0.25) <= 1e-4
    assert abs(beta - np.log(8.0) / 1.1) < 1e-2
    assert len(calls) == len(memo)  # every probe evaluated exactly once

    # a second target reuses the shared memo: the first probe (midpoint 4.0)
    # is already cached, so strictly fewer NEW evaluations than probes
    n_before = len(calls)
    bisect_beta_rate(bpp, target=0.05, max_beta_rate=8.0, memo=memo,
                     tol=1e-4, max_iters=30)
    assert len(calls) - n_before < 30
    assert len(calls) == len(memo)


def test_bisect_returns_closest_probe_when_tolerance_unreachable():
    from binary_rate_search import bisect_beta_rate

    def bpp(beta):
        return 1.0 - beta / 10.0

    # 3 iters cannot reach tol=0: must return the probe CLOSEST to target,
    # not the last one
    beta, achieved = bisect_beta_rate(bpp, target=0.5, max_beta_rate=10.0,
                                      memo={}, tol=0.0, max_iters=3)
    assert abs(achieved - 0.5) <= 1.0 / 8.0 + 1e-12


# ---------------------------------------------------------- subprocesses
def _make_val_set(tmp_path, n=5, size=64):
    val_dir = tmp_path / "val"
    val_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(synth_image(rng, size, size)).save(
            val_dir / f"val_{i:05d}.png")
    return val_dir


def test_build_dataset_then_rate_search_token_map_path(tmp_path):
    """End-to-end: build_openimage_val_dataset writes crops + .npy token
    maps (including the source-exhausted partial batch), and
    binary_rate_search consumes them via --vq_indices_dir. Batch size 2
    over 5 images also exercises the remainder batch (previously dropped,
    biasing avg_bpp vs the reference's full-set mean)."""
    cfg = tmp_path / "tiny.yaml"
    write_tiny_yaml(cfg)
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(5):
        Image.fromarray(synth_image(rng, 96, 96)).save(src / f"s{i}.jpg")
    # one too-small source must be skipped, not crash
    Image.fromarray(synth_image(rng, 32, 32)).save(src / "small.jpg")

    built = tmp_path / "built"
    run_cli([os.path.join(SCRIPTS, "build_openimage_val_dataset.py"),
             "--config_path", str(cfg), "--src_dir", str(src),
             "--save_dir", str(built), "--num_images", "10",
             "--crop", "64", "--batch_size", "4"])
    imgs = sorted(os.listdir(built / "images"))
    maps = sorted(os.listdir(built / "vq_indices"))
    # only 5 usable sources -> 5 crops, and EVERY crop has its token map
    # (4-batch flush + partial flush of the last 1)
    assert len(imgs) == 5
    assert [m.replace(".npy", ".png") for m in maps] == imgs
    idx = np.load(built / "vq_indices" / maps[0])
    assert idx.dtype == np.uint8 and idx.shape == (8, 8)  # 64px / f8

    out = tmp_path / "search"
    run_cli([os.path.join(SCRIPTS, "binary_rate_search.py"),
             "--config_path", str(cfg),
             "--val_dir", str(built / "images"),
             "--vq_indices_dir", str(built / "vq_indices"),
             "--save_dir", str(out),
             "--target_rates", "0.3", "0.8",
             "--beta_vq_list", "1.0", "--batch_size", "2"])
    with open(out / "binary_rate_search_results.json") as f:
        rows = json.load(f)
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["beta_rate"] <= 6.0
        assert np.isfinite(r["achieved_bpp"]) and r["achieved_bpp"] > 0
    # the rate condition: the lower-rate target selects a beta_rate at
    # least as large (monotone decreasing bpp in beta_rate)
    by_target = {r["target_rate"]: r for r in rows}
    assert by_target[0.3]["beta_rate"] >= by_target[0.8]["beta_rate"] - 1e-9


def test_beta_selection_cli(tmp_path):
    """beta_selection over a crafted search-results json: scores each
    candidate (PSNR term; FID omitted without weights and flagged), marks
    exactly one selected row per target rate. Batch 2 over 3 images
    exercises the remainder batch."""
    cfg = tmp_path / "tiny.yaml"
    write_tiny_yaml(cfg)
    val_dir = _make_val_set(tmp_path, n=3)
    sr = tmp_path / "binary_rate_search_results.json"
    with open(sr, "w") as f:
        json.dump([
            {"beta_vq": 1.0, "target_rate": 0.1,
             "beta_rate": 2.0, "achieved_bpp": 0.1},
            {"beta_vq": 2.0, "target_rate": 0.1,
             "beta_rate": 2.2, "achieved_bpp": 0.1},
        ], f)

    out = tmp_path / "sel"
    run_cli([os.path.join(SCRIPTS, "beta_selection.py"),
             "--config_path", str(cfg), "--val_dir", str(val_dir),
             "--search_results", str(sr), "--save_dir", str(out),
             "--batch_size", "2"])

    import csv
    with open(out / "beta_selection_results.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert sum(r["selected"] == "True" for r in rows) == 1
    for r in rows:
        assert np.isfinite(float(r["psnr"]))
        assert r["fid_in_score"] == "False"  # no inception weights in env
        assert float(r["score"]) == float(r["psnr"]) * 2.0  # alpha*PSNR - 0


# ------------------------------------------------- bucket planner (r4)
def test_plan_buckets_groups_by_padded_shape():
    """compress.py's sweep planner: images bucket by PADDED shape (the jit
    caches key on it — driver.py STRIDE reflect-pad), chunks share the
    exact raw resolution and respect batch_size, order is deterministic,
    and n_buckets == the number of distinct padded shapes = the number of
    encode-graph compiles a mixed-resolution sweep pays."""
    from compress import plan_buckets

    sizes = [
        # (path, (width, height)) as PIL reports
        ("a1.png", (512, 384)), ("a2.png", (512, 384)),
        ("a3.png", (512, 384)),
        ("b1.png", (500, 375)),   # pads to the same 384x512 bucket as a*
        ("c1.png", (768, 512)), ("c2.png", (768, 512)),
        ("d1.png", (2040, 1356)),  # >1024px tiling-path geometry
    ]
    chunks, n_buckets = plan_buckets(sizes, batch_size=2)
    # padded shapes: (384,512) for a*/b1, (512,768) for c*, (1408,2048) d1
    assert n_buckets == 3
    # every chunk shares one raw resolution and respects batch_size
    raw = {p: (h, w) for p, (w, h) in sizes}
    for ch in chunks:
        assert len(ch) <= 2
        assert len({raw[p] for p in ch}) == 1
    # all paths exactly once
    flat = [p for ch in chunks for p in ch]
    assert sorted(flat) == sorted(p for p, _ in sizes)
    # biggest padded bucket compiles first
    assert chunks[0] == ["d1.png"]
    # deterministic: same input -> same plan
    assert plan_buckets(sizes, batch_size=2)[0] == chunks


def test_plan_buckets_singletons_and_batch_one():
    from compress import plan_buckets
    sizes = [("x.png", (97, 33))]
    chunks, n_buckets = plan_buckets(sizes, batch_size=8)
    assert chunks == [["x.png"]] and n_buckets == 1
