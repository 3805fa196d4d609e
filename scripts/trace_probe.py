"""Per-op device-time attribution for the reconstruction graph, from a
real profiler trace (VERDICT r3 §Next-3b: "find where the other 30% goes
with a real trace").

Runs reconstruct_uint8 at bench geometry under jax.profiler.trace, parses
the resulting xplane with jax.profiler.ProfileData (no TensorBoard round
trip), and aggregates device-plane event durations by HLO category and by
op name. The chained-dispatch microbenches (PERF.md §10) show XLA convs
reaching 119-146 TF/s while the in-pipeline recon average is ~105 TF/s —
this prints exactly which fusions the difference lives in.

Usage (real chip): python scripts/trace_probe.py [--what recon|decode]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_device_events(trace_dir: str):
    """Parse the newest xplane.pb under trace_dir; return
    [(name, dur_ps, stats_dict)] for every event on device planes."""
    from jax.profiler import ProfileData
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert paths, f"no xplane.pb under {trace_dir}"
    data = ProfileData.from_file(paths[-1])
    events = []
    for plane in data.planes:
        # device planes are named like "/device:TPU:0" (host plane is
        # "/host:CPU"); keep TPU only
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # "XLA Ops" is the synchronous op timeline (sums to wall);
            # "Async XLA Ops" (copy-start spans include wait time) and
            # "XLA Modules" (whole-executable spans) double-count it.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                stats = {}
                for s in ev.stats:
                    try:
                        stats[s[0]] = s[1]
                    except Exception:
                        pass
                events.append((ev.name, ev.duration_ns, line.name, stats))
    return events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="recon",
                    choices=["recon", "decode", "encode", "elic"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/dcvic_trace")
    args = ap.parse_args()

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
    spec = build_comp_model(cfg)
    module = spec.module

    x_init = jnp.zeros((1, 256, 256, 3), jnp.float32)
    b = jnp.array([1.0], jnp.float32)
    params = jax.jit(lambda r: module.init(
        {"params": r}, x_init, b, b, is_train=False))(jax.random.PRNGKey(0))

    B, yH, yW = 16, 48, 32
    Cy = module.bottleneck_y
    rng = np.random.default_rng(0)
    b1 = jnp.ones((B,), jnp.float32)

    if args.what == "recon":
        bufs = [jnp.asarray(rng.normal(0, 2, (B, yH, yW, Cy)), jnp.float32)
                for _ in range(3)]
        fn = jax.jit(lambda p, y: module.apply(
            p, y, b1, b1, method=module.reconstruct_uint8))
        arg_sets = [(params, y) for y in bufs]
    elif args.what == "elic":
        # the ELIC dual-beta analysis encoder alone (encode_front_profile
        # r5: 53 ms at ~61 TF/s — half the VQGAN encoder's rate)
        H, W = 768, 512
        n_embed = module.n_embed
        xs = [jnp.asarray(rng.normal(0, 0.5, (B, H, W, 3)), jnp.float32)
              for _ in range(3)]
        lats = [jnp.asarray(rng.normal(0, 1, (B, H // 8, W // 8, 4)),
                            jnp.float32) for _ in range(3)]
        idxs = [jnp.asarray(rng.integers(0, n_embed, (B, H // 8, W // 8)),
                            jnp.int32) for _ in range(3)]
        fn = jax.jit(lambda p, x, lat, idx: module.apply(
            p, x, lat, idx, b1[:1], b1[:1], method=module.comp_encode))
        arg_sets = list(zip([params] * 3, xs, lats, idxs))
    else:
        raise SystemExit("only recon/elic are wired so far")

    # warm + compile
    out = None
    for a in arg_sets:
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(4):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / 4
    print(f"wall per call: {wall*1e3:.1f} ms", flush=True)

    ITERS = 4
    with jax.profiler.trace(args.trace_dir):
        for i in range(ITERS):
            out = fn(*arg_sets[i % len(arg_sets)])
        jax.block_until_ready(out)

    events = collect_device_events(args.trace_dir)
    print(f"device events (XLA Ops line): {len(events)}")
    if events:
        print("stat keys of a sample event:",
              sorted(events[len(events) // 2][3].keys()))
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    lines = set()
    for name, dur_ns, line, stats in events:
        lines.add(line)
        # strip the "%opname.N = type spec(...)" long form down to opname
        short = name.split(" = ")[0].lstrip("%")
        base = short.split(".")[0]
        by_name[short] += dur_ns
        cat = None
        for k in ("hlo_category", "category", "equation"):
            if k in stats:
                cat = str(stats[k])
                break
        by_cat[cat or base] += dur_ns

    total = sum(by_name.values())
    print(f"planes/lines seen: {sorted(lines)[:8]}")
    print(f"total device event time: {total/1e6/ITERS:.1f} ms/iter\n")
    print("== by category ==")
    for cat, ns in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:40s} {ns/1e6/ITERS:9.2f} ms  "
              f"{100*ns/total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ns in sorted(by_name.items(),
                           key=lambda kv: -kv[1])[:args.top]:
        print(f"  {name[:90]:90s} {ns/1e6/ITERS:9.2f} ms  "
              f"{100*ns/total:5.1f}%")


if __name__ == "__main__":
    main()
