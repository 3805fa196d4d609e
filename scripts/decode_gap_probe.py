"""[HISTORICAL — targets the pre-pipeline monolithic decode graph]

This probe's investigation concluded in round 3: the "composition gap" was
jnp.searchsorted in GaussianConditional.build_indexes (a binary search whose
serialized table gathers cost ~42 ms per ChARM slice in BOTH codec graphs —
see codec/gaussian.py), and the monolithic decode graph it bisects was then
replaced by the shared-executable pipeline (driver._decode_pipeline) for
cross-graph determinism. The script is kept as the experiment log; it no
longer runs against the current driver (driver._decode_tpu_fn is gone).

Original purpose: bisect the decode graph's composition gap.

decode_profile.py measures whole decode graph (recon=False) at ~543 ms vs
~291 ms for the sum of its standalone parts (z scan + hyper + 6x charm convs
+ 6x y scans). This probe rebuilds the SAME graph shape as driver.
_decode_tpu_fn (recon off) with pieces selectively stubbed, to localize the
~250 ms gap:

  V1 full        — faithful copy of the graph (baseline; expect ~543 ms)
  V2 noscan      — decode_section replaced by a presupplied-symbol stub
                   (cursor math kept); isolates the in-graph cost of the
                   scans+epilogues (expect V1-V2 ~ their in-graph cost)
  V3 noepi       — scans kept, escape epilogue dropped (val gather only);
                   isolates the in-graph epilogue share
  V4 fixedidx    — scans+epilogues kept, but idx comes from a precomputed
                   constant instead of the charm params convs (convs still
                   run, their idx output is discarded); isolates fusion
                   effects of the conv->idx->scan producer chain

Usage (real chip): python scripts/decode_gap_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=6, warmup=2):
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
    from dc_vic_tpu.ops.rans_device import (ESC_FLAG, TIER1_MARKER,
                                            decode_section, section_lanes)

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
    res = codec.compress(imgs, quality_ind=0)
    z_strs = [r["string_list"][1] for r in res]
    y_strs = [r["string_list"][2] for r in res]

    zH, zW = H // codec.model_stride, W // codec.model_stride
    yH, yW = H // codec.y_stride, W // codec.y_stride
    lanes = codec.lanes
    y_cap, z_cap = codec._tpu_caps(B, yH, yW, zH, zW, lanes)
    yw, yb = codec._upload_words(y_strs, y_cap)
    zw, zb = codec._upload_words(z_strs, z_cap)
    jax.block_until_ready((yw, zw))
    b1 = jnp.array([1.0], jnp.float32)

    Cz = module.bottleneck_z
    Cy = module.bottleneck_y
    ns = codec.num_slices
    sc = Cy // ns
    Ly = section_lanes(yH * yW * sc, lanes)
    Lz = section_lanes(zH * zW * Cz, lanes)

    # reference symbols for the stub variants (from a real decode).
    # sparse_esc=False: PRNG-weight bench streams run ~74% escapes, far over
    # esc_cap, so the sparse epilogue would poison the cursor (the driver
    # would pick the dense graph from the header's dense-escape flag).
    dec_lat = codec._get_jit(
        ("tpu_dec", B, zH, zW, yH, yW, False, True, lanes, True),
        lambda: codec._decode_tpu_fn(B, zH, zW, yH, yW, False, True, lanes,
                                     sparse_esc=False))
    out_ref = dec_lat(params, zw, zb, yw, yb, b1, b1)
    z_sym_ref = jnp.round(out_ref["z_hat"]).astype(jnp.int32)
    y_hat_ref = out_ref["y_hat"]

    ytab, ztab = codec._dtable("y"), codec._dtable("z")

    def scan_noepi(words, img_base, cursor, state, idx, table):
        """decode_section with the escape epilogue dropped: scan + val
        gather; escapes resolve to the val entry (wrong values, right
        shapes/costs)."""
        Bb, n, L = idx.shape
        tidx_rows = idx * (1 << 16)
        tr = lambda a: a.transpose(1, 0, 2)
        if state is None:
            lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
            gidx = img_base[:, None] + cursor[:, None] + lane2
            low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
            high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
            x0 = low | (high << 16)
            cursor = cursor + 2 * L
        else:
            x0 = state

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            adv = jnp.take(table.adv_flat, rows_t + cum.astype(jnp.int32),
                           mode="clip")
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            widx = img_base[:, None] + cur[:, None] + pos - 1
            w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(body, (x0, cursor),
                                             tr(tidx_rows))
        val = jnp.take(table.val_flat,
                       tr(cums).astype(jnp.int32) + tidx_rows, mode="clip")
        sym = jnp.where(val >= ESC_FLAG, 0, val)
        return sym, cursor, x_fin

    def flat_norm(a):
        """Pin `a` to a fresh dense layout: a 1-D tensor has exactly one
        dense layout, so barrier(reshape(-1)) then reshape back strips any
        padded/tiled layout the producer (conv) chain would otherwise
        propagate into the scan xs."""
        import jax as _jax
        return _jax.lax.optimization_barrier(a.reshape(-1)).reshape(a.shape)

    def make_graph(variant):
        fixed_idx = jnp.asarray(
            rng.integers(0, 64, (B, yH * yW * sc // Ly, Ly)), np.int32)

        def f(params, z_words, z_base, y_words, y_base, b1, b2,
              z_sym_in, y_syms_in):
            z_idx = jnp.broadcast_to(
                jnp.arange(Cz, dtype=jnp.int32),
                (B, zH, zW, Cz)).reshape(B, -1, Lz)
            if variant == "noscan":
                z_sym = z_sym_in.reshape(B, -1, Lz)
                z_cursor = jnp.zeros((B,), jnp.int32)
            else:
                zdec = scan_noepi if variant == "noepi" else decode_section
                z_sym, z_cursor, _ = zdec(
                    z_words, z_base, jnp.zeros((B,), jnp.int32), None,
                    z_idx, ztab)
            hyper_out, z_hat = module.apply(
                params, z_sym.reshape(B, zH, zW, Cz),
                method=module.hyper_decode)

            cursor = jnp.zeros((B,), jnp.int32)
            y_prev = jnp.zeros((B, yH, yW, 0), jnp.float32)
            lane_state = None
            for i in range(ns):
                mu, idx = module.apply(
                    params, i, hyper_out, y_prev,
                    method=module.charm_slice_params)
                idx3 = idx.astype(jnp.int32).reshape(B, -1, Ly)
                if variant == "fixedidx":
                    idx3 = fixed_idx + 0 * idx3[:, :1, :1]
                elif variant == "inputidx":
                    # traced INPUT values (convs still run, idx discarded):
                    # discriminates intermediate-vs-input from const-vs-var
                    idx3 = y_syms_in[i] % 64 + 0 * idx3[:, :1, :1]
                elif variant == "flatxs":
                    idx3 = flat_norm(idx3)
                if variant == "noscan":
                    sym = y_syms_in[i]
                    cursor = cursor + jnp.sum(sym[..., :1] * 0, axis=(1, 2)
                                              ).astype(jnp.int32)
                    lane_state = None
                else:
                    ydec = scan_noepi if variant == "noepi" \
                        else decode_section
                    sym, cursor, lane_state = ydec(
                        y_words, y_base, cursor, lane_state, idx3, ytab)
                y_slice = module.apply(
                    params, i, hyper_out, y_prev,
                    sym.reshape(B, yH, yW, sc), mu,
                    method=module.charm_slice_reconstruct)
                y_prev = jnp.concatenate([y_prev, y_slice], axis=-1)
            return {"y_hat": y_prev,
                    "consumed": jnp.stack(
                        [z_cursor, cursor], axis=0)}
        return jax.jit(f)

    y_syms_fake = [jnp.asarray(
        rng.integers(-2, 3, (B, yH * yW * sc // Ly, Ly)), np.int32)
        for _ in range(ns)]
    variants = os.environ.get(
        "GAP_VARIANTS", "full,noscan,noepi,fixedidx").split(",")
    for variant in variants:
        g = make_graph(variant)
        dt = timeit(
            lambda *a: g(*a)["y_hat"][0, 0, 0, 0],
            [(params, zw, zb, yw, yb, b1, b1, z_sym_ref, y_syms_fake)])
        print(f"{variant:10s}: {dt*1e3:8.1f} ms", flush=True)
        if variant == "full":
            out = g(params, zw, zb, yw, yb, b1, b1, z_sym_ref, y_syms_fake)
            err = float(jnp.max(jnp.abs(out["y_hat"] - y_hat_ref)))
            print(f"           (y_hat matches real decode to {err:.2e})")


if __name__ == "__main__":
    main()
