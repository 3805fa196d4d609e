"""Sub-graph decomposition of the tpu-format decode at bench geometry.

The decode pipeline (driver._decode_pipeline, shared executables): z rANS ->
hyperdecoder -> 6x(ChARM slice params -> rANS -> slice reconstruct) ->
reconstruction. To target optimization, this times each constituent as its
own jitted graph at the real flagship shapes (batch 16, Kodak 768x512,
PRNG weights, bf16 codec dtype like bench.py) and prints the budget vs the
measured whole-graph decode. Inputs cycle across distinct buffers (the
environment value-caches identical executions, docs/PERF.md section 5).

Usage (real chip): python scripts/decode_profile.py
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

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(repo, "config", "dc_vic_patchgan.yaml"))
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        cfg["codec_dtype"] = "bfloat16"
    cfg["entropy_precision"] = os.environ.get("BENCH_ENTROPY_PRECISION",
                                              "default")
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    B, yH, yW = 16, 48, 32
    zH, zW = 12, 8
    Cy, Cz = module.bottleneck_y, module.bottleneck_z
    ns = cfg["subnet"]["context_model"]["num_slices"]
    sc = Cy // ns
    rng = np.random.default_rng(0)
    NBUF = 3
    b1 = jnp.ones((B,), jnp.float32)

    rows = []

    def record(name, dt):
        rows.append((name, dt * 1e3))
        print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)

    # 1. reconstruction (y_hat -> uint8 image)
    yhats = [jnp.asarray(rng.normal(0, 2, (B, yH, yW, Cy)), jnp.float32)
             for _ in range(NBUF)]
    recon = jax.jit(lambda p, y: module.apply(
        p, y, b1, b1, method=module.reconstruct_uint8))
    record("reconstruct_uint8 (ELIC+VQest+VQGAN dec)",
           timeit(recon, [(params, y) for y in yhats]))

    # 2. hyperdecoder (z symbols -> hyper_out)
    zsyms = [jnp.asarray(rng.integers(-4, 5, (B, zH, zW, Cz)), jnp.int32)
             for _ in range(NBUF)]
    hyper = jax.jit(lambda p, z: module.apply(
        p, z, method=module.hyper_decode))
    record("hyper_decode", timeit(hyper, [(params, z) for z in zsyms]))

    # 3. ChARM slice chain WITHOUT entropy decode (params + reconstruct)
    hyper_out = hyper(params, zsyms[0])[0]
    syms = [jnp.asarray(rng.integers(-4, 5, (B, yH, yW, Cy)), jnp.int32)
            for _ in range(NBUF)]

    def charm_chain(p, hyper_out, sym_all):
        y_prev = jnp.zeros((B, yH, yW, 0), jnp.float32)
        for i in range(ns):
            mu, idx = module.apply(p, i, hyper_out, y_prev,
                                   method=module.charm_slice_params)
            sym = sym_all[..., i * sc:(i + 1) * sc]
            y_slice = module.apply(p, i, hyper_out, y_prev, sym, mu,
                                   method=module.charm_slice_reconstruct)
            y_prev = jnp.concatenate([y_prev, y_slice], axis=-1)
        return y_prev

    chain = jax.jit(charm_chain)
    record(f"charm chain x{ns} (params+reconstruct, no rANS)",
           timeit(chain, [(params, hyper_out, s) for s in syms]))

    # 4. the rANS decode scans at the same geometry (y: ns chained sections,
    #    z: one section), via the real decode_section + real tables
    from dc_vic_tpu.codec.driver import Codec
    from dc_vic_tpu.ops import rans_device as rd
    from dc_vic_tpu.ops.rans_device import (decode_section, encode_stream,
                                            pack_streams, section_lanes)
    codec = Codec(spec, params, lanes=int(os.environ.get("BENCH_LANES",
                                                         "512")))
    codec._ensure_dtables()
    ytab, ztab = codec._dtable("y"), codec._dtable("z")
    ny = yH * yW * sc
    Ly = section_lanes(ny, codec.lanes)
    nrows_y = ytab.adv_flat.size >> 16
    secs = [(jnp.asarray(rng.integers(-4, 5, (B, ny // Ly, Ly)), np.int32),
             jnp.asarray(rng.integers(0, nrows_y, (B, ny // Ly, Ly)),
                         np.int32)) for _ in range(ns)]
    vals, mask = jax.jit(lambda s: encode_stream(
        [(sym, idx) for sym, idx in s], ytab))(secs)
    packed, counts = jax.jit(pack_streams)(vals, mask)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    def y_scans(words, base, idx_list):
        cursor = jnp.zeros((B,), jnp.int32)
        state = None
        outs = []
        for i in range(ns):
            sym, cursor, state = decode_section(
                words, base, cursor, state, idx_list[i], ytab)
            outs.append(sym)
        return jnp.stack(outs), cursor

    jy = jax.jit(y_scans)
    idx_list = [idx for _, idx in secs]
    out = jy(packed, base, idx_list)
    assert np.array_equal(np.asarray(out[0][0]), np.asarray(secs[0][0])), \
        "y scan decode mismatch"
    record(f"y rANS decode x{ns} sections (L={Ly})",
           timeit(jy, [(packed, base, idx_list)]))

    nz = zH * zW * Cz
    Lz = section_lanes(nz, codec.lanes)
    z_idx = jnp.broadcast_to(jnp.arange(Cz, dtype=jnp.int32),
                             (B, zH, zW, Cz)).reshape(B, -1, Lz)
    z_sym = jnp.asarray(rng.integers(-4, 5, (B, nz // Lz, Lz)), np.int32)
    zvals, zmask = jax.jit(lambda s, i: encode_stream([(s, i)], ztab))(
        z_sym, z_idx.reshape(B, -1, Lz))
    zpacked, zcounts = jax.jit(pack_streams)(zvals, zmask)
    zbase = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(zcounts)[:-1].astype(jnp.int32)])
    jz = jax.jit(lambda w, bb, i: decode_section(
        w, bb, jnp.zeros((B,), jnp.int32), None, i, ztab)[:2])
    record(f"z rANS decode (L={Lz})",
           timeit(jz, [(zpacked, zbase, z_idx.reshape(B, -1, Lz))]))

    total = sum(ms for _, ms in rows)
    print(f"\nsum of parts: {total:.1f} ms")

    # 5. the real decode pipeline (chain of shared executables since the
    #    round-3 determinism refactor), with and without the reconstruction
    #    tail
    imgs = np.clip(rng.normal(128, 40, (B, 768, 512, 3)), 0,
                   255).astype(np.uint8)
    res = codec.compress(imgs, quality_ind=0)
    rz = [r["string_list"][1] for r in res]
    ry = [r["string_list"][2] for r in res]
    y_cap, z_cap = codec._tpu_caps(B, yH, yW, zH, zW, codec.lanes)
    yw, yb = codec._upload_words(ry, y_cap)
    zw, zb = codec._upload_words(rz, z_cap)
    jax.block_until_ready((yw, zw))
    from dc_vic_tpu.codec.container import HeaderHandler
    esc_dense = any(bool(HeaderHandler.decode(r["string_list"][0])
                         ["esc_dense"]) for r in res)
    for recon_on in (False, True):
        def g(zw_, zb_, yw_, yb_):
            out = codec._decode_pipeline(
                zw_, zb_, yw_, yb_, B, zH, zW, yH, yW, codec.lanes,
                sparse_esc=not esc_dense, recon=recon_on, b1=b1, b2=b1)
            return (out["img"] if recon_on else out["y_hat"],
                    out["consumed_words"])
        dt = timeit(g, [(zw, zb, yw, yb)], iters=5)
        print(f"decode pipeline (recon={recon_on}): {dt*1e3:8.1f} ms",
              flush=True)

    dev = codec.bench_device_cycle(imgs, quality_ind=0)
    print(f"bench_device_cycle: dec {dev['dec_s']*1e3:.1f} ms, "
          f"enc {dev['enc_s']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
