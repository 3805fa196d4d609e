"""One-command parity runbook against the reference's released artifacts.

The reference's only end-to-end truths are (a) the 3-image demo golden
number — avg_bpp ~= 0.03921 on kodim03/15/23 at q=0 with the released
dc_vic_patchgan checkpoint (ref: README.md:61) — and (b) the Kodak q=0..4
rd_results tables (ref: rd_results/kodak.csv, mirrored in BASELINE.md).
Weights are not distributable inside this environment, so this script makes
the check a single command for the day the artifacts land:

    python scripts/parity_check.py \
        --dc_vic_ckpt checkpoint/dc_vic_patchgan.pth.tar \
        --kodak_dir datasets/kodak [--demo_only] [--quality_tol_db 0.1]

Steps: convert the torch checkpoint (the released .pth.tar carries the
frozen VQGAN inside comp_model, ref: base_model.py:110) -> compress the 3
demo images at q=0 in the reference-compatible `compressai` stream format
-> gate on avg_bpp -> full Kodak q=0..4 bpp/PSNR sweep vs BASELINE gates.
Exits non-zero on any gate failure.

Also in this file: print_golden_vector_snippet() emits the script to run in
ANY compressai-bearing environment to produce tests/golden/
compressai_vectors.npz — byte-level golden vectors that retire the residual
"both rANS implementations could share one spec misreading" risk
(tests/test_rans_spec.py picks the file up automatically when present).
Run `python scripts/parity_check.py --print_golden_snippet` to get it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEMO_IMAGES = ("kodim03.png", "kodim15.png", "kodim23.png")
DEMO_AVG_BPP = 0.03921           # ref README.md:61 ("approximately")
DEMO_BPP_TOL = 5e-4              # float-order drift budget, not byte drift

# BASELINE.md Kodak table (dc_vic_patchgan; bpp shared with oasis)
KODAK_BPP = [0.053731, 0.086002, 0.116387, 0.150659, 0.188850]
KODAK_PSNR = [25.0766, 26.2333, 26.8881, 27.6816, 28.4168]

GOLDEN_SNIPPET = r'''
# Run in any environment with compressai==1.2.4 installed to produce the
# byte-level golden vectors consumed by tests/test_rans_spec.py.
# Usage: python make_golden_vectors.py && copy compressai_vectors.npz
#        into <repo>/tests/golden/
import numpy as np
from compressai._CXX import pmf_to_quantized_cdf
from compressai.ans import RansEncoder, RansDecoder

rng = np.random.default_rng(1234)
out = {}

# 1) pmf_to_quantized_cdf exact outputs on random pmfs
for t in range(8):
    k = int(rng.integers(2, 40))
    pmf = (rng.random(k) ** 4).astype(np.float32)
    tail = np.float32(rng.random() * 1e-3)
    pmf = pmf / pmf.sum() * (1 - tail)
    prob = np.concatenate([pmf, [tail]]).astype(np.float32)
    cdf = np.asarray(pmf_to_quantized_cdf(prob.tolist(), 16), np.int32)
    out[f"pmf_{t}"] = prob
    out[f"cdf_{t}"] = cdf

# 2) rANS byte vectors: encode symbols against those tables
enc = RansEncoder()
for t in range(8):
    cdf = out[f"cdf_{t}"]
    n_sym = len(cdf) - 1
    cdfs = [cdf.tolist()]
    lengths = [len(cdf)]
    offsets = [-(n_sym // 2)]
    n = int(rng.integers(16, 512))
    idx = np.zeros(n, np.int32)
    sym = rng.integers(-(n_sym // 2) - 8, n_sym, n).astype(np.int32)
    s = enc.encode_with_indexes(sym.tolist(), idx.tolist(), cdfs,
                                lengths, offsets)
    dec = RansDecoder()
    rec = dec.decode_with_indexes(s, idx.tolist(), cdfs, lengths, offsets)
    assert list(rec) == sym.tolist()
    out[f"sym_{t}"] = sym
    out[f"idx_{t}"] = idx
    out[f"offset_{t}"] = np.int32(offsets[0])
    out[f"bytes_{t}"] = np.frombuffer(s, np.uint8)

np.savez("compressai_vectors.npz", **out)
print("wrote compressai_vectors.npz:", {k: v.shape for k, v in out.items()})
'''


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dc_vic_ckpt", type=str, default=None,
                   help="released dc_vic_patchgan.pth.tar (torch)")
    p.add_argument("--config_path", type=str,
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "config", "dc_vic_patchgan.yaml"))
    p.add_argument("--kodak_dir", type=str, default=None,
                   help="directory with kodim01..24.png (demo images "
                        "suffice with --demo_only)")
    p.add_argument("--demo_only", action="store_true")
    p.add_argument("--quality_tol_db", type=float, default=0.1,
                   help="PSNR gate tolerance vs BASELINE.md (dB)")
    p.add_argument("--bpp_rel_tol", type=float, default=2e-3,
                   help="relative bpp gate vs BASELINE.md")
    p.add_argument("--print_golden_snippet", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.print_golden_snippet:
        print(GOLDEN_SNIPPET)
        return
    from dc_vic_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    if not args.dc_vic_ckpt or not args.kodak_dir:
        raise SystemExit("--dc_vic_ckpt and --kodak_dir are required "
                         "(or --print_golden_snippet)")

    from PIL import Image

    from compress import init_params, load_image
    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.metrics.image import calc_psnr
    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config

    spec = build_comp_model(load_config(args.config_path))
    params = init_params(spec, args.dc_vic_ckpt)
    # compressai stream format: byte-compatible with the reference's coder,
    # so the real_bpp numbers are comparable bit for bit.
    codec = Codec(spec, params, stream_format="compressai")

    failures = []

    def gate(name, got, want, tol):
        ok = abs(got - want) <= tol
        print(f"{'PASS' if ok else 'FAIL'}  {name}: got {got:.5f}, "
              f"want {want:.5f} (tol {tol:g})")
        if not ok:
            failures.append(name)

    # ---- 1. demo golden number (ref README.md:61)
    demo_paths = [os.path.join(args.kodak_dir, n) for n in DEMO_IMAGES]
    missing = [p for p in demo_paths if not os.path.exists(p)]
    if missing:
        raise SystemExit(f"demo images missing: {missing}")
    bpps = []
    for p in demo_paths:
        img = load_image(p)
        r = codec.compress(img[None], quality_ind=0)[0]
        nbits = sum(len(s) for s in r["string_list"]) * 8 + 3 * 32
        bpps.append(nbits / r["num_pixel"])
    gate("demo avg_bpp q=0 (3 Kodak images)", float(np.mean(bpps)),
         DEMO_AVG_BPP, DEMO_BPP_TOL)

    # ---- 2. Kodak q=0..4 sweep vs rd_results (BASELINE.md)
    if not args.demo_only:
        kodak = sorted(
            p for p in os.listdir(args.kodak_dir)
            if p.startswith("kodim") and p.endswith(".png"))
        if len(kodak) != 24:
            raise SystemExit(f"expected 24 Kodak images, found {len(kodak)}")
        for q in range(5):
            bpps, psnrs = [], []
            for name in kodak:
                img = load_image(os.path.join(args.kodak_dir, name))
                r = codec.compress(img[None], quality_ind=q)[0]
                nbits = sum(len(s) for s in r["string_list"]) * 8 + 3 * 32
                bpps.append(nbits / r["num_pixel"])
                fake = codec.decompress([r["string_list"]])[0]
                ref = (img.astype(np.float32) / 255 - 0.5) * 2
                fk = (fake.astype(np.float32) / 255 - 0.5) * 2
                psnrs.append(float(calc_psnr(ref[None], fk[None])))
            gate(f"kodak q={q} avg bpp", float(np.mean(bpps)), KODAK_BPP[q],
                 args.bpp_rel_tol * KODAK_BPP[q])
            gate(f"kodak q={q} avg PSNR", float(np.mean(psnrs)),
                 KODAK_PSNR[q], args.quality_tol_db)

    if failures:
        raise SystemExit(f"PARITY GATES FAILED: {failures}")
    print("all parity gates passed")


if __name__ == "__main__":
    main()
