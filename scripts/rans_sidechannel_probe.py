"""Decompose decode_section cost: scan vs OUT-OF-SCAN side channel.

The round-3 gather probe initially misattributed decode_section's cost to
the in-scan table gather; in fact the scan (with its two sequential
gathers) is ~12-16 ms/section while the out-of-scan epilogue — the dense
val gather plus THREE dense escape-side-channel gathers (w1/lo/hi, each
B*n*L = 786k elements at the hardware's ~9 ns/elem serialized gather
rate) — is ~26-29 ms/section. Escapes are rare on realistic streams, so a
sparse escape decode (contiguous block reads of at most E_max words +
searchsorted positions + scatter) should remove ~3 of the 4 dense gathers.

This probe times, at flagship section geometry (B=16, 96 steps, L=512):
  1. real decode_section (current code) end to end;
  2. a no-barrier variant of the same (A/B the optimization_barrier);
  3. the scan alone;
  4. the dense out-of-scan epilogue alone (cums fed in);
  5. the sparse epilogue alone (E_max = n/8);
  6. lo+hi as one 2-wide slice-gather (cheap alternative if sparse loses).

Usage (real chip): python scripts/rans_sidechannel_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg_sets, iters=10, warmup=2):
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

    from dc_vic_tpu.codec.gaussian import GaussianConditional
    from dc_vic_tpu.ops import rans_device as rd

    rng = np.random.default_rng(0)
    B, L = 16, 512
    steps = 96
    n = steps * L

    table = rd.DeviceCdfTable(GaussianConditional().build_cdf_table())
    nrows = table.adv_flat.size >> 16

    # tame symbols: realistic streams have rare escapes (the dense epilogue's
    # gather cost is escape-rate-independent, so timing stays representative)
    sym = rng.integers(-1, 2, (B, steps, L)).astype(np.int32)
    idx_np = rng.integers(0, nrows, (B, steps, L)).astype(np.int32)
    symj, idxj = jnp.asarray(sym), jnp.asarray(idx_np)
    vals, mask = jax.jit(
        lambda s, i: rd.encode_sections(s, i, table))(symj, idxj)
    packed, counts = jax.jit(rd.pack_streams)(vals, mask)
    words = packed
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    zero = jnp.zeros((B,), jnp.int32)

    # --- 1. real decode_section (current code)
    def dec(words, base, idx):
        s, cur, fin = rd.decode_section(words, base, zero, None, idx, table)
        return s, cur, fin

    out = jax.jit(dec)(words, base, idxj)
    assert np.array_equal(np.asarray(out[0]), sym), "decode mismatch!"
    dt = timeit(jax.jit(lambda w, b, i: dec(w, b, i)[0][0, 0, 0]),
                [(words, base, idxj)])
    print(f"1. decode_section (current):        {dt*1e3:7.2f} ms")

    # --- helpers reproducing decode_section's pieces
    tidx_rows = idxj * (1 << 16)
    tr = lambda a: a.transpose(1, 0, 2)

    def scan_only(words, base, idx, barrier):
        rows = idx * (1 << 16)
        lane2 = 2 * jnp.arange(L, dtype=jnp.int32)
        gidx = base[:, None] + lane2
        low = jnp.take(words, gidx, mode="clip").astype(jnp.uint32)
        high = jnp.take(words, gidx + 1, mode="clip").astype(jnp.uint32)
        x0 = low | (high << 16)
        cursor = jnp.full((B,), 2 * L, jnp.int32)

        def body(carry, rows_t):
            x, cur = carry
            cum = x & jnp.uint32(0xFFFF)
            tix = rows_t + cum.astype(jnp.int32)
            if barrier:
                tix = jax.lax.optimization_barrier(tix)
            adv = jnp.take(table.adv_flat, tix, mode="clip")
            if barrier:
                adv = jax.lax.optimization_barrier(adv)
            x = (adv >> 16) * (x >> 16) + (adv & jnp.uint32(0xFFFF))
            need = x < (1 << 16)
            pos = jnp.cumsum(need, axis=1, dtype=jnp.int32)
            widx = base[:, None] + cur[:, None] + pos - 1
            w = jnp.take(words, widx, mode="clip").astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | w, x)
            return (x, cur + pos[:, -1]), cum.astype(jnp.uint16)

        (x_fin, cursor), cums = jax.lax.scan(body, (x0, cursor), tr(rows))
        return cums, cursor, x_fin

    # --- 2/3. scan alone, with and without barriers
    for barrier in (True, False):
        f = jax.jit(lambda w, b, i, bar=barrier:
                    scan_only(w, b, i, bar)[0][0, 0, 0])
        dt = timeit(f, [(words, base, idxj)])
        print(f"{'2' if barrier else '3'}. scan only (barrier={barrier!s:5s})"
              f":      {dt*1e3:7.2f} ms")

    cums_d, cursor_d, _ = jax.jit(
        lambda w, b, i: scan_only(w, b, i, True))(words, base, idxj)
    cums_d = tr(cums_d)  # [B, steps, L]

    # --- 4. dense epilogue alone (decode_section lines 283-309)
    def dense_epi(words, base, cursor, cums):
        val = jnp.take(table.val_flat,
                       tidx_rows + cums.astype(jnp.int32), mode="clip")
        esc = val >= rd.ESC_FLAG
        esc_f = esc.reshape(B, -1)
        r1 = jnp.cumsum(esc_f, axis=1, dtype=jnp.int32)
        n_esc = r1[:, -1]
        w1 = jnp.take(words, base[:, None] + cursor[:, None] + r1 - 1,
                      mode="clip").astype(jnp.uint32)
        big = esc_f & (w1 == rd.TIER1_MARKER)
        r2 = jnp.cumsum(big, axis=1, dtype=jnp.int32)
        n_big = r2[:, -1]
        t2b = base[:, None] + (cursor + n_esc)[:, None]
        lo = jnp.take(words, t2b + 2 * r2 - 2, mode="clip").astype(jnp.uint32)
        hi = jnp.take(words, t2b + 2 * r2 - 1, mode="clip").astype(jnp.uint32)
        raw = jnp.where(big, lo | (hi << 16), w1).astype(jnp.int32)
        raw = raw.reshape(B, steps, L)
        off = (val & 0xFFFF) - (1 << 15)
        maxv = (val >> 16) & 0x3FFF
        esc_v = jnp.where(raw & 1 == 1, -(raw >> 1) - 1,
                          (raw >> 1) + maxv) + off
        return jnp.where(esc, esc_v, val)

    f4 = jax.jit(dense_epi)
    sym_dense = f4(words, base, cursor_d, cums_d)
    assert np.array_equal(np.asarray(sym_dense), sym), "dense epi mismatch!"
    dt = timeit(jax.jit(lambda w, b, c, cm: dense_epi(w, b, c, cm)[0, 0, 0]),
                [(words, base, cursor_d, cums_d)])
    print(f"4. dense epilogue alone:            {dt*1e3:7.2f} ms")

    # --- 5. sparse epilogue (E_max block reads + searchsorted + scatter)
    E = n // 8

    def sparse_epi(words, base, cursor, cums):
        val = jnp.take(table.val_flat,
                       tidx_rows + cums.astype(jnp.int32), mode="clip")
        esc = val >= rd.ESC_FLAG
        esc_f = esc.reshape(B, -1)
        r1 = jnp.cumsum(esc_f, axis=1, dtype=jnp.int32)
        n_esc = r1[:, -1]                                   # [B]
        # contiguous tier-1 block, one row per image: words[base+cursor+e]
        e_ar = jnp.arange(E, dtype=jnp.int32)
        t1 = jnp.take(words, base[:, None] + cursor[:, None] + e_ar[None, :],
                      mode="clip").astype(jnp.uint32)       # [B, E]
        big_e = t1 == rd.TIER1_MARKER
        r2e = jnp.cumsum(big_e, axis=1, dtype=jnp.int32)
        t2b = base[:, None] + (cursor + n_esc)[:, None]
        lo = jnp.take(words, t2b + 2 * r2e - 2,
                      mode="clip").astype(jnp.uint32)
        hi = jnp.take(words, t2b + 2 * r2e - 1,
                      mode="clip").astype(jnp.uint32)
        raw_e = jnp.where(big_e, lo | (hi << 16), t1).astype(jnp.int32)
        # position of the e-th escape in the flat plane
        pos_e = jnp.searchsorted(r1[0], e_ar + 1)[None, :] if B == 1 else \
            jax.vmap(lambda row: jnp.searchsorted(row, e_ar + 1))(r1)
        valid = e_ar[None, :] < n_esc[:, None]
        val_e = jnp.take_along_axis(val.reshape(B, -1),
                                    jnp.minimum(pos_e, n - 1), axis=1)
        off_e = (val_e & 0xFFFF) - (1 << 15)
        maxv_e = (val_e >> 16) & 0x3FFF
        esc_v = jnp.where(raw_e & 1 == 1, -(raw_e >> 1) - 1,
                          (raw_e >> 1) + maxv_e) + off_e
        flat_pos = jnp.where(valid, pos_e, n)
        symf = val.reshape(B, -1)
        symf = jax.vmap(lambda s, p, v: s.at[p].set(v, mode="drop"))(
            symf, flat_pos, esc_v)
        overflow = jnp.maximum(jnp.max(n_esc) - E, 0)
        return symf.reshape(B, steps, L), overflow

    f5 = jax.jit(sparse_epi)
    sym_sp, ovf = f5(words, base, cursor_d, cums_d)
    assert int(ovf) == 0, f"escape overflow {ovf} (raise E for this probe)"
    assert np.array_equal(np.asarray(sym_sp), sym), "sparse epi mismatch!"
    dt = timeit(jax.jit(
        lambda w, b, c, cm: sparse_epi(w, b, c, cm)[0][0, 0, 0]),
        [(words, base, cursor_d, cums_d)])
    print(f"5. sparse epilogue (E={E}):       {dt*1e3:7.2f} ms")

    # --- 6. dense epilogue, lo+hi as one 2-wide slice gather
    def dense_epi_slice2(words, base, cursor, cums):
        val = jnp.take(table.val_flat,
                       tidx_rows + cums.astype(jnp.int32), mode="clip")
        esc = val >= rd.ESC_FLAG
        esc_f = esc.reshape(B, -1)
        r1 = jnp.cumsum(esc_f, axis=1, dtype=jnp.int32)
        n_esc = r1[:, -1]
        w1 = jnp.take(words, base[:, None] + cursor[:, None] + r1 - 1,
                      mode="clip").astype(jnp.uint32)
        big = esc_f & (w1 == rd.TIER1_MARKER)
        r2 = jnp.cumsum(big, axis=1, dtype=jnp.int32)
        t2b = base[:, None] + (cursor + n_esc)[:, None]
        start = (t2b + 2 * r2 - 2).reshape(-1, 1)
        pair = jax.lax.gather(
            words, jnp.maximum(start, 0),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2,), mode="clip")                  # [B*n, 2]
        lo = pair[:, 0].reshape(B, -1).astype(jnp.uint32)
        hi = pair[:, 1].reshape(B, -1).astype(jnp.uint32)
        raw = jnp.where(big, lo | (hi << 16), w1).astype(jnp.int32)
        raw = raw.reshape(B, steps, L)
        off = (val & 0xFFFF) - (1 << 15)
        maxv = (val >> 16) & 0x3FFF
        esc_v = jnp.where(raw & 1 == 1, -(raw >> 1) - 1,
                          (raw >> 1) + maxv) + off
        return jnp.where(esc, esc_v, val)

    f6 = jax.jit(dense_epi_slice2)
    sym6 = f6(words, base, cursor_d, cums_d)
    assert np.array_equal(np.asarray(sym6), sym), "slice2 epi mismatch!"
    dt = timeit(jax.jit(
        lambda w, b, c, cm: dense_epi_slice2(w, b, c, cm)[0, 0, 0]),
        [(words, base, cursor_d, cums_d)])
    print(f"6. dense epilogue, 2-wide slices:   {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
