"""Is the decode scan's cost idx-VALUE-dependent?

decode_gap_probe.py showed the in-graph y scans run ~2x slower than the
standalone measurement, and that replacing the conv-produced idx with random
constants recovers standalone speed. But the standalone timings ALSO used
random idx — so "conv-produced layout" and "conv-produced values" were
confounded. This probe times the standalone 6-section y-scan chain with
  (a) uniform-random idx rows (the previous standalone setup),
  (b) the REAL idx planes the flagship model produces at bench settings
      (strongly concentrated on a few scale rows),
  (c) a constant idx (all rows 0),
on the SAME real bitstreams re-encoded per idx set. It also prints the real
per-section escape counts vs ops/rans_device.esc_cap (does the sparse
epilogue apply to bench streams at all?).

Usage (real chip): python scripts/rans_idxvalue_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=8, warmup=2):
    import jax
    out = None
    for a in arg_sets:
        out = fn(*a)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*arg_sets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dc_vic_tpu.models import build_comp_model
    from dc_vic_tpu.utils.config import load_config
    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.ops.rans_device import (decode_section, encode_stream,
                                            esc_cap, pack_streams,
                                            section_lanes)

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        cfg["codec_dtype"] = "bfloat16"
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    B, H, W = 16, 768, 512
    codec = Codec(spec, params,
                  lanes=int(os.environ.get("BENCH_LANES", "512")))
    codec._ensure_dtables()
    rng = np.random.default_rng(0)
    imgs = np.clip(rng.normal(128, 40, (B, H, W, 3)), 0,
                   255).astype(np.uint8)

    # real symbol/idx planes at bench settings (from the encode graph)
    handle = codec.compress_dispatch(imgs, quality_ind=0)
    out = handle["out"]
    y_sym = np.asarray(out["y_symbols"], np.int32)   # [B, yH, yW, Cy]
    y_idx = np.asarray(out["y_indexes"], np.int32)
    Cy = y_sym.shape[-1]
    ns = codec.num_slices
    sc = Cy // ns
    Bq, yH, yW = y_sym.shape[:3]
    n_sec = yH * yW * sc
    L = section_lanes(n_sec, codec.lanes)
    steps = n_sec // L

    # per-section escape counts vs cap
    tab = codec.y_table
    off = np.asarray(tab.offsets)
    maxv = np.asarray(tab.cdf_lengths) - 2
    value = y_sym - off[y_idx]
    esc = (value < 0) | (value >= maxv[y_idx])
    per_sec = esc.reshape(B, yH, yW, ns, sc).sum(axis=(1, 2, 4))
    print(f"esc_cap(section)={esc_cap(n_sec)}; per-image max section "
          f"escapes: min={per_sec.max(1).min()}, "
          f"median={int(np.median(per_sec.max(1)))}, "
          f"max={per_sec.max()}")
    vals, counts_r = np.unique(y_idx, return_counts=True)
    top = np.argsort(counts_r)[::-1][:5]
    print("idx row histogram (top 5):",
          {int(vals[t]): f"{counts_r[t]/y_idx.size:.3f}" for t in top})

    ytab = codec._dtable("y")
    nrows = ytab.adv_flat.size >> 16

    def slice_major(a):
        return (a.reshape(B, yH, yW, ns, sc)
                 .transpose(0, 3, 1, 2, 4).reshape(B, ns, steps, L))

    idx_real = slice_major(y_idx)
    idx_rand = rng.integers(0, nrows, idx_real.shape).astype(np.int32)
    idx_const = np.zeros_like(idx_real)

    for name, idxs in (("random idx", idx_rand), ("REAL idx", idx_real),
                       ("const idx", idx_const)):
        # symbols must be decodable under these idx rows: re-encode fresh
        # small symbols against them
        sym = rng.integers(-1, 2, idx_real.shape).astype(np.int32)
        secs = [(jnp.asarray(sym[:, s]), jnp.asarray(idxs[:, s]))
                for s in range(ns)]
        vals_, mask = jax.jit(lambda s: encode_stream(
            [(a, b) for a, b in s], ytab))(secs)
        packed, counts = jax.jit(pack_streams)(vals_, mask)
        base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        idx_list = [jnp.asarray(idxs[:, s]) for s in range(ns)]

        def y_scans(words, base, idx_list):
            cursor = jnp.zeros((B,), jnp.int32)
            state = None
            outs = []
            for i in range(ns):
                s_, cursor, state = decode_section(
                    words, base, cursor, state, idx_list[i], ytab)
                outs.append(s_)
            return jnp.stack(outs), cursor

        jy = jax.jit(y_scans)
        got = jy(packed, base, idx_list)
        assert np.array_equal(np.asarray(got[0][0]), sym[:, 0]), name
        dt = timeit(jy, [(packed, base, idx_list)])
        print(f"y scans x{ns}, {name:10s}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
