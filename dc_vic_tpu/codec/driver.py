"""Codec driver: compress / decompress orchestration.

TPU-first restructure of the reference codec path (ref:
src/models/comp_model/hyperprior_dc_vic_model.py:330-440 and
hyperprior_charm_dc_vic_model.py:62-91). The reference moves entropy models
+ hyperdecoder + context model to the CPU and interleaves torch convs with
rANS calls per ChARM slice; here the pipeline is organized around what the
hardware rewards:

  * Native "tpu" stream format (default): encode is ONE device graph
    emitting compact symbol planes; the host C coder entropy-codes them OFF
    the device critical path (overlapping the next batch's device compute);
    decompress is ONE device graph — z entropy decode, hyperdecoder, the
    full autoregressive ChARM slice chain with in-graph rANS decode, and
    reconstruction — zero host round trips inside the slice loop.
  * "compressai" stream format: bit-compatible with the reference's
    compressai.ans streams; host coding, per-slice device steps with the
    two batch halves interleaved so host rANS overlaps device compute.
  * Transfers are shaped for the link: flat 1-D uint8 image buffers (tiled
    NHWC layouts pay ~4x on d2h), fused stats buffers, chunk-quantized
    stream uploads. See docs/PERF.md for the measurements behind each
    choice.
  * jit caches are keyed by padded shape buckets, so a resolution sweep
    compiles once per bucket.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import TYPE_CHECKING, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rans import (
    CdfTable,
    RansDecoder,
    decode_with_indexes,
    encode_with_indexes,
)
from ..ops.rans_device import (
    DeviceCdfTable,
    decode_section,
    encode_sections,
    encode_stream,
    pack_streams,
    section_lanes,
)
from .bottleneck import EntropyBottleneck, build_bottleneck_cdf
from .container import HeaderHandler
from .gaussian import GaussianConditional, get_scale_table

if TYPE_CHECKING:  # type-only: models imports codec's siblings at runtime
    from ..models import CompModelSpec

STRIDE = 64  # reflect-pad multiple (ref: base_model.py:30)


class PendingImages:
    """Handle to an in-flight decoded image batch: the device holds a FLAT
    uint8 buffer (fast-path d2h) and the host reshapes/crops on fetch. Fetch
    later to overlap the transfer with the next batch's compute."""

    def __init__(self, data, meta, check=None, keep=None):
        self._data = data      # device flat buffer, or host np [B,H,W,3]
        self._meta = meta      # (B, padH, padW, H, W) or None if already np
        self._check = check    # optional stream-integrity callback
        self._keep = keep      # batch entries to keep (mesh batch padding)

    def fetch(self) -> np.ndarray:
        if self._check is not None:
            self._check()
            self._check = None
        if self._meta is None:
            arr = self._data
        else:
            B, padH, padW, H, W = self._meta
            arr = np.asarray(self._data).reshape(B, padH, padW, 3)
            arr = arr[:, :H, :W, :]
        return arr if self._keep is None else arr[:self._keep]


def _pad_np(x: np.ndarray, stride: int = STRIDE) -> np.ndarray:
    """Reflect-pad to a stride multiple, preserving dtype (uint8 images stay
    uint8 so the h2d transfer is 4x smaller; normalization runs on device)."""
    H, W = x.shape[1], x.shape[2]
    ph, pw = (-H) % stride, (-W) % stride
    if ph == 0 and pw == 0:
        return x
    return np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")


class Codec:
    """Stateful codec around a built model: tables + jitted graph cache
    (equivalent of codec_setup + compress/decompress in the reference).

    stream_format:
      * "tpu" (native): entropy coding runs ON the device
        (ops/rans_device.py) — symbol planes never cross the host link, and
        the whole ChARM decode chain is one jitted graph. Costs 4 bytes per
        interleave lane per stream in rate (see that module's docstring).
      * "compressai": byte-compatible with the reference's compressai.ans
        streams (ops/rans/rans.cpp); entropy coding on the host.
    Decode auto-detects the format from the header, so one Codec can read
    both.

    portable=True decouples stream decodability from the encoder's batch
    configuration: every float that feeds symbolization (hyper_out,
    per-slice mu, y_hat_prev, non-charm means) is derived through
    CANONICAL per-image (batch-1) executables on BOTH encode and decode,
    so a batch-16-encoded .bin decodes bit-exactly one image at a time or
    in any grouping (the reference's per-image CPU decode has this
    property for free, hyperprior_dc_vic_model.py:389-440). Costs O(B)
    extra dispatches per batch on the entropy-parameter chain (the recon
    and entropy scans stay batched). Non-portable streams record their
    encode batch in the header and the decoder fails fast on a mismatch
    instead of risking a silent lowering-dependent desync (PERF.md §8b).
    Platform coupling is PER FORMAT (measured, r5 — docs/artifacts/
    cross_platform_r5.json): the compressai format with its default
    params_backend="cpu" derives entropy parameters on the CPU platform
    on both sides (the reference's codec placement,
    hyperprior_dc_vic_model.py:70-73), so a TPU-encoded .bin decodes
    BIT-EXACTLY on a CPU-only machine — proven on real hardware. The tpu
    format keeps the whole decode accelerator-resident and therefore
    remains coupled to the accelerator type + XLA/JAX version (the same
    artifact records the accel-chain hyper_out diverging by ~1.5e-4
    between TPU f32-high and CPU f32, which desyncs the y decode)."""

    def __init__(self, spec: "CompModelSpec", params,
                 stream_format: str = "tpu", encode_backend: str = "host",
                 lanes: int = 128, mesh=None, data_axis: str = "data",
                 portable: bool = False,
                 params_backend: Optional[str] = None):
        assert stream_format in ("tpu", "compressai"), stream_format
        assert encode_backend in ("host", "device"), encode_backend
        # params_backend: which platform derives the entropy parameters
        # (hyper_out, per-slice mu/sigma, y_hat). "cpu" reproduces the
        # reference's codec placement (entropy models + hyperdecoder +
        # context model on CPU, hyperprior_dc_vic_model.py:70-73): both
        # sides run the SAME CPU f32 programs, so a stream encoded on one
        # accelerator decodes on a machine with a different (or no)
        # accelerator — the property the reference's .bin has by
        # construction. Default for the compressai format (the parity
        # format) on a single device; the tpu format keeps the chain on
        # the accelerator (its in-graph rANS scans live there).
        if params_backend is None:
            params_backend = ("cpu" if stream_format == "compressai"
                              and mesh is None else "accel")
        assert params_backend in ("cpu", "accel"), params_backend
        assert not (params_backend == "cpu" and stream_format == "tpu"), (
            "params_backend='cpu' applies to the compressai stream format "
            "(the tpu format's entropy scans are device-resident by design)")
        assert not (params_backend == "cpu" and mesh is not None)
        self.params_backend = params_backend
        assert lanes & (lanes - 1) == 0 and 1 <= lanes <= 4096, lanes
        # Portable mode pins the param chain to single-device batch-1
        # canonical executables. Under a mesh (r5, lifting the r4
        # exclusion) those executables run on mesh device 0 — single-device
        # avals, so the lowering is IDENTICAL to a non-mesh codec's on the
        # same platform — while the front, integer entropy scans, pack and
        # reconstruction stay batched/sharded. Streams encoded on an
        # N-device mesh therefore decode bit-exactly on one device (or any
        # mesh), and vice versa.
        self.portable = portable
        # interleave-lane cap for tpu-format streams: rate (4 B/lane/section)
        # vs decode latency; recorded in the header so any codec can decode
        self.lanes = lanes
        self.spec = spec
        self.module = spec.module
        # Multi-chip serving: with a jax.sharding.Mesh the codec runs its
        # device pipelines SPMD data-parallel — params, CDF LUTs, and stream
        # word buffers replicated (gathers from them stay device-local);
        # every batch-major tensor sharded on dim 0, so XLA partitions the
        # conv stacks and decode scans across chips with no collectives on
        # the hot path. Batch size must divide by the mesh size. Streams are
        # bit-exact per codec CONFIGURATION (see module doc): a mesh codec's
        # executables are different lowerings than a single-chip codec's, so
        # decode tpu-format streams on the same mesh shape that encoded them
        # (the compressai format has no such coupling — host-coded).
        self.mesh = mesh
        self._canon_dev = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._repl = NamedSharding(mesh, PartitionSpec())
            self._bsh = NamedSharding(mesh, PartitionSpec(data_axis))
            params = jax.device_put(params, self._repl)
            if portable:
                # canonical single-device home for the portable param chain
                self._canon_dev = mesh.devices.flat[0]
                self._params_canon = jax.device_put(params, self._canon_dev)
        self.params = params
        # CPU copy of the params for the cpu entropy-parameter chain (jit
        # placement follows committed operands, so the chain executables
        # compile/run on the CPU platform when fed these).
        self._accel_dev = jax.devices()[0]
        if self.params_backend == "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None  # no CPU platform in this process
            if cpu is None or cpu == self._accel_dev:
                # already on CPU (or no separate CPU backend): the accel
                # chain IS the cpu chain
                self.params_backend = "cpu" if cpu is not None else "accel"
                self._cpu_dev = None
                self._params_chain = params
            else:
                self._cpu_dev = cpu
                self._params_chain = jax.device_put(params, cpu)
        else:
            self._cpu_dev = None
            self._params_chain = params
        self.stream_format = stream_format
        # tpu-format encode can run on the host (C coder — overlaps device
        # compute in the pipeline; default) or fully on the device
        self.encode_backend = encode_backend
        # architecture constants (the reference probes these with a dummy run,
        # hyperprior_dc_vic_model.py:75-89; static here: 4 stride-2 convs in
        # the encoder, 2 in the hyperencoder)
        self.y_stride = 16
        self.model_stride = 64
        # Stream-defining numeric configuration, recorded in tpu-format
        # headers and asserted on decode (a mismatched decoder would
        # silently desync otherwise — ADVICE r4).
        self._fast_entropy = (self.module.entropy_precision or "high") != "high"
        self._bf16 = self.module.codec_dtype == "bfloat16"
        if stream_format == "compressai" and self._fast_entropy:
            import warnings
            warnings.warn(
                "stream_format='compressai' with entropy_precision="
                f"'{self.module.entropy_precision}': reference/CPU-parity "
                "streams are only guaranteed with entropy_precision='high' "
                "(the fast bf16 entropy-parameter mode is scoped to the tpu "
                "stream format's shared-executable contract)",
                stacklevel=2)
        self._setup_tables()
        self._jit = {}
        # Per-image rANS byte work is independent; the C calls release the
        # GIL, so a thread pool parallelizes the host codec across images.
        self._pool = ThreadPoolExecutor(max_workers=16)

    # ------------------------------------------------------------------
    def _setup_tables(self):
        eb = EntropyBottleneck(self.module.bottleneck_z)
        z_params = {"params": self.params["params"]["entropy_z"]}
        self.z_table: CdfTable = build_bottleneck_cdf(eb, z_params)
        gaussian = GaussianConditional(scale_bound=self.module.scale_bound)
        self.y_table: CdfTable = gaussian.build_cdf_table(get_scale_table())
        self.num_slices = (self.module.context_cfg or {}).get("num_slices", 6) \
            if self.module.use_charm else 0
        # device-resident tables for the tpu stream format (lazy: the LUTs
        # cost ~tens of MB of HBM, only uploaded when actually used)
        self._dtables: Dict[str, DeviceCdfTable] = {}

    def _dtable(self, which: str) -> DeviceCdfTable:
        # Must be materialized OUTSIDE any trace (the tables are device
        # constants, not graph values) — see _ensure_dtables.
        return self._dtables[which]

    def _chain_put(self, x):
        """Commit an entropy-parameter-chain operand to the chain's
        platform (CPU when params_backend='cpu' — placement of the shared
        executables follows their committed operands)."""
        if self._cpu_dev is None:
            return self._put_batch(x)
        if isinstance(x, jax.Array):
            return jax.device_put(x, self._cpu_dev)
        return jax.device_put(np.asarray(x), self._cpu_dev)

    def _canon_put(self, x):
        """Commit a portable canonical-chain operand to its single-device
        home (mesh device 0 under a mesh; identity otherwise — canonical
        executables then follow the default placement)."""
        if self._canon_dev is None:
            return x
        return jax.device_put(x, self._canon_dev)

    def _canon_params(self):
        return (self._params_canon if self._canon_dev is not None
                else self._params_chain)

    def _stack_canon(self, parts):
        """Batch-concat per-image canonical outputs and hand them back to
        the batched (mesh-sharded) stages."""
        out = (parts[0] if len(parts) == 1
               else self._get_jit(("stack0",), self._stack0_fn)(*parts))
        if self.mesh is not None:
            out = jax.device_put(out, self._bsh)
        return out

    def _ensure_dtables(self):
        if not self._dtables:
            if self._cpu_dev is not None:
                # cpu chain (compressai format): the tables only feed the
                # coalesce stats executable, which runs where its operands
                # live
                with jax.default_device(self._cpu_dev):
                    self._dtables["y"] = DeviceCdfTable(self.y_table)
                    self._dtables["z"] = DeviceCdfTable(self.z_table)
                return
            self._dtables["y"] = DeviceCdfTable(self.y_table)
            self._dtables["z"] = DeviceCdfTable(self.z_table)
            if self.mesh is not None:
                # LUTs are captured as jit constants: commit them replicated
                # so they co-locate with mesh-sharded arguments
                for t in self._dtables.values():
                    for name in ("pair_flat", "av_flat",
                                 "offsets", "maxv"):
                        setattr(t, name,
                                jax.device_put(getattr(t, name), self._repl))

    def _put_batch(self, x):
        """Host array whose dim 0 is batch(-aligned) -> device. Under a mesh
        this commits it batch-sharded (dim 0 must divide by the mesh size —
        for flat [B*X] buffers whole images land on each device since X is
        constant per image)."""
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._bsh)

    def _put_repl(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._repl)

    def _mesh_pad(self, n: int) -> int:
        """Batch size the device pipelines actually run at: under a mesh,
        batches are padded up to the mesh-size multiple (pad entries are
        repeats, dropped from the outputs)."""
        if self.mesh is None:
            return n
        m = self.mesh.devices.size
        return -(-n // m) * m

    def _shard0(self):
        """out_shardings pin for a pipeline-entry executable's batch-major
        outputs (None on single device). Downstream executables inherit
        shardedness through GSPMD propagation from their operands."""
        return None if self.mesh is None else self._bsh

    def _get_jit(self, key, make):
        if key not in self._jit:
            self._jit[key] = make()
        return self._jit[key]

    # ------------------------------------------------------------------
    # Pipeline stage builders. The codec runs encode and decode as CHAINS of
    # small executables instead of two monolithic graphs, because the stream
    # only stays synchronized if both sides derive bitwise-identical entropy
    # parameters — and XLA lowers the same f32 subgraph differently in
    # different executables (MXU tiling / bf16-multiply rounding are
    # lowering-dependent; optimization barriers do NOT pin this). Every
    # float that must match (hyper_out, per-slice mu, y_hat_prev, non-charm
    # means) is therefore produced by ONE executable reused verbatim by both
    # pipelines; only integers (symbols, stream words) cross between
    # executables. See models/dc_vic.py "shared-executable pipeline" note
    # and docs/PERF.md.
    def _front_fn(self, shape):
        # Takes a FLAT uint8/f32 buffer: 1-D arrays cross the tunnel at the
        # raw link rate, while NHWC uint8 arrays pay a ~4x tiled-layout
        # penalty (see scripts/tunnel_bench.py).
        def f(params, x_flat, b1, b2):
            return self.module.apply(
                params, x_flat.reshape(shape), b1, b2,
                method=self.module.encode_front)
        # pipeline entry: pin batch-sharded outputs under a mesh (downstream
        # executables inherit shardedness from their operands)
        return jax.jit(f, out_shardings=self._shard0())

    def _front_from_vq_fn(self):
        def f(params, x, lat, idx, b1, b2):
            return self.module.apply(
                params, x, lat, idx, b1, b2,
                method=self.module.encode_front_from_vq)
        return jax.jit(f)

    def _symbolize_fn(self, i):
        return jax.jit(lambda p, y, mu: self.module.apply(
            p, i, y, mu, method=self.module.charm_symbolize))

    def _y_means_idx_fn(self):
        return jax.jit(lambda p, ho: self.module.apply(
            p, ho, method=self.module.y_means_indexes))

    def _y_symbolize_fn(self):
        return jax.jit(lambda p, y, m: self.module.apply(
            p, y, m, method=self.module.y_symbolize))

    def _y_dequant_fn(self):
        return jax.jit(lambda p, s, m: self.module.apply(
            p, s, m, method=self.module.y_dequantize))

    def _vq_tile_fn(self):
        return jax.jit(lambda p, t: self.module.apply(
            p, t, method=self.module.vq_encode_tile))

    def _vq_quantize_fn(self):
        return jax.jit(lambda p, h: self.module.apply(
            p, h, method=self.module.vq_quantize))

    def _hyper_decode_fn(self):
        return jax.jit(lambda p, zs: self.module.apply(
            p, zs, method=self.module.hyper_decode))

    def _slice_params_fn(self, i):
        return jax.jit(lambda p, ho, prev: self.module.apply(
            p, i, ho, prev, method=self.module.charm_slice_params))

    def _slice_step_fn(self, i):
        return jax.jit(lambda p, ho, prev, sym, mu: self.module.apply(
            p, i, ho, prev, sym, mu, method=self.module.charm_decode_step))

    def _recon_fn(self, flat: bool = True):
        # flat=True emits a 1-D uint8 buffer (fast-path d2h, see _front_fn).
        def f(p, y_hat, b1, b2):
            img = self.module.apply(
                p, y_hat, b1, b2, method=self.module.reconstruct_uint8)
            return img.reshape(-1) if flat else img
        return jax.jit(f)

    # --------------------------------------------------- tpu-format graphs
    # Word buffers that cross the host link are chunk-quantized so the jit
    # caches stay small: the big graphs always see fixed-capacity buffers.
    _WORD_CHUNK = 1 << 14  # 16k words = 32 KB

    def _tpu_y_sections(self, Cy):
        """y stream sections (channel ranges) in decode order: one per ChARM
        slice, or a single section for non-charm models."""
        if self.module.use_charm:
            sc = Cy // self.num_slices
            return [(s * sc, (s + 1) * sc) for s in range(self.num_slices)]
        return [(0, Cy)]

    def _tpu_pack(self, y_sym, y_idx, z_sym, clipped: bool = True,
                  escfree: bool = False):
        """Traced: device-entropy-encode the symbol planes into two packed
        word buffers (per-image y and z streams; ChARM slice sections chained
        inside each y stream — one flush per stream, not per section).
        escfree=True (the dispatch default): speculate that NO escape fires
        (measured true for the whole bench batch at the contract workload),
        so the side-channel slots are statically absent — ONE compaction
        update per symbol. The exact escape counts come back with the
        stats; on a miss _finalize_tpu re-packs through the clipped
        executable (below).
        clipped=True: symbols are clipped to +-32000
        by the codec symbolizers, which makes tier-2 escape words possible
        only when a row's offset pushes the zigzag past 2^16 — never for
        realistic tables/symbols — so the tier-2 slots are statically absent
        (halves the compaction scatter, the encode's largest cost). If one
        WOULD fire, the escape counts come back poisoned (CLIP_POISON) and
        _finalize_tpu re-packs through the dense clipped=False executable —
        exact, just slower, and only ever compiled on pathological inputs.
        Escape maxima come straight from the encode (with_esc_counts) —
        recomputing them cost ~100 ms of re-gathers."""
        B, yH, yW, Cy = y_sym.shape
        sections = []
        L0 = None
        for lo, hi in self._tpu_y_sections(Cy):
            sec_s = y_sym[..., lo:hi].reshape(B, -1)
            sec_i = y_idx[..., lo:hi].reshape(B, -1)
            L = section_lanes(sec_s.shape[1], self.lanes)
            L0 = L if L0 is None else L0
            assert L == L0, "ChARM slices share geometry, so lanes must match"
            sections.append((sec_s.reshape(B, -1, L),
                             sec_i.reshape(B, -1, L)))
        vals, mask, y_esc = encode_stream(sections, self._dtable("y"),
                                          clipped=clipped, escfree=escfree,
                                          with_esc_counts=True)
        packed_y, y_counts = pack_streams(vals, mask)
        Cz = z_sym.shape[-1]
        zN = z_sym.shape[1] * z_sym.shape[2] * Cz
        Lz = section_lanes(zN, self.lanes)
        z_idx = jnp.broadcast_to(
            jnp.arange(Cz, dtype=jnp.int32),
            (B,) + z_sym.shape[1:3] + (Cz,)).reshape(B, -1, Lz)
        v, m, z_esc = encode_sections(z_sym.reshape(B, -1, Lz), z_idx,
                                      self._dtable("z"), clipped=clipped,
                                      escfree=escfree,
                                      with_esc_counts=True)
        packed_z, z_counts = pack_streams(v, m)
        return (packed_y, y_counts, packed_z, z_counts,
                jnp.max(y_esc, axis=1), jnp.max(z_esc, axis=1))

    def _pack_fn(self):
        """tpu-format encode tail: (y symbols, cdf indexes, z symbols) ->
        packed device streams + fused stats buffer. Integer-in, so it may be
        its own executable (see the pipeline note above _front_fn)."""
        def f(y_sym16, y_idx8, z_sym16, y_hat):
            y_sym = y_sym16.astype(jnp.int32)
            y_idx = y_idx8.astype(jnp.int32)
            z_sym = z_sym16.astype(jnp.int32)
            (packed_y, y_counts, packed_z, z_counts,
             y_escmax, z_escmax) = self._tpu_pack(y_sym, y_idx, z_sym,
                                                  escfree=True)
            # pred bits are EXACT here: the packed word counts are the
            # stream sizes actually written (x16 bits, incl. flush).
            y_bits = y_counts.astype(jnp.float32) * 16.0
            z_bits = z_counts.astype(jnp.float32) * 16.0
            # one fused stats buffer (single small d2h): bits + word counts.
            # A raw f32 count is only exact below 2^24 words (~32 MB/image)
            # and nothing bounds stream size for adversarial inputs, so each
            # int32 count travels as two exactly-representable f32 halves
            # (hi = count >> 12, lo = count & 0xFFF) — exact below 2^36
            # words. (Escape counts are bounded by section symbol counts
            # < 2^24, so a single f32 each is exact.)
            def f32_split(c):
                c = c.astype(jnp.int32)
                return jnp.concatenate([(c >> 12).astype(jnp.float32),
                                        (c & 0xFFF).astype(jnp.float32)])
            max_abs_y = jnp.max(jnp.abs(y_hat))
            max_abs_sym = jnp.max(jnp.abs(y_sym)).astype(jnp.float32)
            stats = jnp.concatenate([
                y_bits, z_bits, max_abs_y[None], max_abs_sym[None],
                f32_split(y_counts), f32_split(z_counts),
                y_escmax.astype(jnp.float32),
                z_escmax.astype(jnp.float32)])
            return dict(stats=stats, packed_y=packed_y, packed_z=packed_z)
        return jax.jit(f)

    def _pack_clipped_fn(self):
        """Escape-speculation-miss retry: re-encode the stashed symbol
        planes through the clipped pack, which carries the tier-1 escape
        slots (poisons if tier-2 would fire — then _finalize_tpu escalates
        to the dense pack). Dispatched only when the fast escfree pack
        reports a nonzero escape count, so on realistic low-bpp streams
        this executable is never compiled."""
        def f(y_sym16, y_idx8, z_sym16):
            (packed_y, y_counts, packed_z, z_counts,
             y_escmax, z_escmax) = self._tpu_pack(
                y_sym16.astype(jnp.int32), y_idx8.astype(jnp.int32),
                z_sym16.astype(jnp.int32), clipped=True)
            return dict(packed_y=packed_y, y_counts=y_counts,
                        packed_z=packed_z, z_counts=z_counts,
                        y_escmax=y_escmax, z_escmax=z_escmax)
        return jax.jit(f)

    def _pack_dense_fn(self):
        """Pathological-input retry: re-encode the stashed symbol planes
        through the dense (clipped=False) pack, which carries the tier-2
        escape slots. Dispatched by _finalize_tpu only when the clipped
        pack reports CLIP_POISON — so this executable is never compiled on
        realistic streams."""
        def f(y_sym16, y_idx8, z_sym16):
            (packed_y, y_counts, packed_z, z_counts,
             y_escmax, z_escmax) = self._tpu_pack(
                y_sym16.astype(jnp.int32), y_idx8.astype(jnp.int32),
                z_sym16.astype(jnp.int32), clipped=False)
            return dict(packed_y=packed_y, y_counts=y_counts,
                        packed_z=packed_z, z_counts=z_counts,
                        y_escmax=y_escmax, z_escmax=z_escmax)
        return jax.jit(f)

    def _coalesce_fn(self):
        """Host-coded formats' encode tail: fuse the symbol planes and stats
        into the two d2h buffers compress_finalize reads (each separate
        fetch over the tunnel pays a ~30 ms sync floor). pred bits use the
        rANS tables (the cost of the bytes the C coder will write) instead
        of the reference's Gaussian-likelihood estimate."""
        from ..ops.rans_device import coded_bits

        def f(y_sym16, y_idx8, z_sym16, y_hat):
            y_sym = y_sym16.astype(jnp.int32)
            y_idx = y_idx8.astype(jnp.int32)
            z_sym = z_sym16.astype(jnp.int32)
            B = y_sym.shape[0]
            Cz = z_sym.shape[-1]
            z_idx = jnp.broadcast_to(jnp.arange(Cz, dtype=jnp.int32),
                                     z_sym.shape)
            # Symbol and CDF index share one uint16 plane (sym in 10 bits
            # biased, idx in 6 bits: 64 scale-table entries) — halves the
            # symbol d2h bytes. The host falls back to the separate planes
            # when max_abs_sym >= 512 (pathological inputs).
            y_packed = ((y_idx8.astype(jnp.uint16) << 10)
                        | (jnp.clip(y_sym, -512, 511) + 512)
                        .astype(jnp.uint16))
            sym_plane = jnp.concatenate(
                [y_packed.reshape(B, -1),
                 jax.lax.bitcast_convert_type(z_sym16, jnp.uint16)
                    .reshape(B, -1)], axis=1)
            y_bits = coded_bits(y_sym, y_idx, self._dtable("y"))
            z_bits = coded_bits(z_sym, z_idx, self._dtable("z"))
            max_abs_y = jnp.max(jnp.abs(y_hat))
            max_abs_sym = jnp.max(jnp.abs(y_sym)).astype(jnp.float32)
            stats = jnp.concatenate(
                [y_bits, z_bits, max_abs_y[None], max_abs_sym[None]])
            return dict(sym_plane=sym_plane, stats=stats)
        return jax.jit(f)

    def _zdec_fn(self, B, zH, zW, lanes: int, sparse_esc: bool,
                 tier2: bool = True, escfree: bool = False):
        """z stream entropy decode: word buffer -> z symbols (int16) +
        consumed-words cursor. The cursor output doubles as the stream-
        integrity check AND keeps the scan carry live: with dead cursors the
        XLA:TPU backend has been observed to miscompile the decode scans in
        large fused graphs (wrong symbols at ~2.5% of positions; see
        tests/test_tiling.py large-image selfcheck and PERF.md)."""
        Cz = self.module.bottleneck_z

        def f(z_words, z_base):
            zN = zH * zW * Cz
            Lz = section_lanes(zN, lanes)
            z_idx = jnp.broadcast_to(
                jnp.arange(Cz, dtype=jnp.int32),
                (B, zH, zW, Cz)).reshape(B, -1, Lz)
            z_sym, z_cursor, _ = decode_section(
                z_words, z_base, jnp.zeros((B,), jnp.int32), None, z_idx,
                self._dtable("z"), sparse_esc=sparse_esc, tier2=tier2,
                escfree=escfree)
            return (z_sym.reshape(B, zH, zW, Cz).astype(jnp.int16),
                    z_cursor)
        # decode-pipeline entry: words/base are replicated, so pin the
        # batch-sharded outputs explicitly under a mesh
        return jax.jit(f, out_shardings=self._shard0())

    def _ysec_fn(self, first: bool, B, yH, yW, sc, lanes: int,
                 sparse_esc: bool, tier2: bool = True,
                 escfree: bool = False):
        """One y-stream section entropy decode: (words, cursor, lane states,
        cdf indexes) -> (symbols int16 [B, yH, yW, sc], cursor, states).
        first=True reads the stream's 2L flush words (chained format: lane
        states then carry across the remaining sections). Integer-in/
        integer-out, so the same executable serves every slice of the
        chain; the float mu/y_prev path lives in the shared slice-step
        executables instead (see _front_fn note)."""
        L = section_lanes(yH * yW * sc, lanes)

        def f(y_words, y_base, cursor, state, idx8):
            idx = idx8.astype(jnp.int32).reshape(B, -1, L)
            sym, cursor2, state2 = decode_section(
                y_words, y_base, cursor, None if first else state, idx,
                self._dtable("y"), sparse_esc=sparse_esc, tier2=tier2,
                escfree=escfree)
            return (sym.reshape(B, yH, yW, sc).astype(jnp.int16),
                    cursor2, state2)
        return jax.jit(f)

    def _concat_i16_fn(self):
        """Channel-concat the per-slice int16 symbol planes (integers —
        executable-boundary safe)."""
        return jax.jit(lambda *parts: jnp.concatenate(parts, axis=-1))

    def _concat_u8_fn(self):
        return jax.jit(lambda *parts: jnp.concatenate(parts, axis=-1))

    def _stack0_fn(self):
        """Batch-concat per-image [1, ...] arrays (portable mode). Pure
        data movement — exact for floats, so it is boundary-safe even for
        y_hat/z_hat (the VALUES were produced by the canonical batch-1
        executables; stacking cannot change them)."""
        return jax.jit(lambda *parts: jnp.concatenate(parts, axis=0))

    def _upload_words(self, strings: List[bytes], cap: int):
        """Host bytes -> device word buffer of static capacity `cap`, with
        per-image word offsets. The exact-size upload is chunk-quantized and
        a tiny pad graph (keyed by chunk count) expands it to `cap`, so the
        big decode graphs compile once per (B, resolution)."""
        lens = np.array([len(s) // 2 for s in strings], np.int64)
        base = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int32)
        words = np.frombuffer(b"".join(strings), np.uint16)
        n = len(words)
        if n > cap:
            raise ValueError(
                f"stream words ({n}) exceed the static decode capacity "
                f"({cap}) for this geometry — truncating would decode to "
                "garbage; the streams do not belong to this (B, resolution, "
                "lanes) configuration")
        ch = self._WORD_CHUNK
        padded = np.zeros((min((n + ch - 1) // ch * ch, cap),), np.uint16)
        padded[:n] = words
        pad = self._get_jit(("wpad", padded.shape[0], cap),
                            lambda: jax.jit(lambda w: jnp.zeros(
                                (cap,), jnp.uint16).at[:w.shape[0]].set(w),
                                out_shardings=(None if self.mesh is None
                                               else self._repl)))
        return pad(self._put_repl(padded)), self._put_repl(base)

    def _tpu_caps(self, B, yH, yW, zH, zW, lanes: int):
        """Static worst-case word capacities for the y and z buffers."""
        from ..ops.rans_device import WORST_WORDS_PER_SYM as WPS
        Cy, Cz = self.module.bottleneck_y, self.module.bottleneck_z
        y_cap = 0
        for lo, hi in self._tpu_y_sections(Cy):
            N = yH * yW * (hi - lo)
            y_cap += 2 * section_lanes(N, lanes) + WPS * N
        zN = zH * zW * Cz
        z_cap = 2 * section_lanes(zN, lanes) + WPS * zN
        return B * y_cap, B * z_cap

    # ------------------------------------------------------------------
    def _encode_param_chain_portable(self, y, z_sym):
        """Portable-mode encode chain: derive every float that feeds
        symbolization through CANONICAL per-image (batch-1) executables —
        the same programs a batch-1 decoder compiles — so ANY decoder
        batch grouping reproduces the entropy parameters bitwise
        (batch-B executables are different XLA lowerings and may round
        bf16-boundary values differently, PERF.md §8b). Only integers and
        the encoder-only y (never recomputed by a decoder) cross the
        per-image slicing boundary. Costs O(B) extra dispatches; the
        front, pack, and reconstruction stay batched. (Called with y/z_sym
        already committed to the chain platform by _encode_param_chain.)
        Under a mesh the chain runs on the canonical single device (mesh
        device 0) and the stacked outputs are resharded for the batched
        pack (see __init__)."""
        p = self._canon_params()
        B, yH, yW = y.shape[0], y.shape[1], y.shape[2]
        hyper = self._get_jit(("hyper", (1,) + z_sym.shape[1:]),
                              self._hyper_decode_fn)
        ys, yi, yh, zh = [], [], [], []
        if self.module.use_charm:
            cat16 = self._get_jit(("cat16",), self._concat_i16_fn)
            cat8 = self._get_jit(("cat8",), self._concat_u8_fn)
            p0 = self._get_jit(("slice_p", 0, (1, yH, yW)),
                               lambda: self._slice_params_fn(0))
            for b in range(B):
                ho, z_hat_b = hyper(p, self._canon_put(z_sym[b:b + 1]))
                y_b = self._canon_put(y[b:b + 1])
                y_prev = jnp.zeros((1, yH, yW, 0), jnp.float32)
                mu, idx = p0(p, ho, y_prev)
                syms, idxs = [], []
                for i in range(self.num_slices):
                    sq = self._get_jit(("symq", i, (1,) + y.shape[1:]),
                                       lambda i=i: self._symbolize_fn(i))
                    sym = sq(p, y_b, mu)
                    syms.append(sym)
                    idxs.append(idx)
                    sf = self._get_jit(("slice_s", i, (1, yH, yW)),
                                       lambda i=i: self._slice_step_fn(i))
                    y_prev, mu, idx = sf(p, ho, y_prev, sym, mu)
                ys.append(cat16(*syms))
                yi.append(cat8(*idxs))
                yh.append(y_prev)
                zh.append(z_hat_b)
        else:
            ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
            sq = self._get_jit(("ysymq",), self._y_symbolize_fn)
            dq = self._get_jit(("ydq",), self._y_dequant_fn)
            for b in range(B):
                ho, z_hat_b = hyper(p, self._canon_put(z_sym[b:b + 1]))
                means, idx = ymi(p, ho)
                sym = sq(p, self._canon_put(y[b:b + 1]), means)
                ys.append(sym)
                yi.append(idx)
                yh.append(dq(p, sym, means))
                zh.append(z_hat_b)
        return (self._stack_canon(ys), self._stack_canon(yi),
                self._stack_canon(yh), self._stack_canon(zh))

    def _encode_param_chain(self, y, z_sym):
        """Shared-executable encode chain: derive hyper_out, per-slice
        mu/idx, and y_hat through THE SAME compiled executables the decoder
        uses (same jit-cache keys as _decompress_tpu / decompress_raw), so
        the entropy parameters both sides compute are bitwise identical by
        construction. Returns (y_syms int16, y_idxs uint8, y_hat, z_hat).
        In portable mode the chain instead runs per image at the canonical
        batch-1 shape (see _encode_param_chain_portable)."""
        if self._cpu_dev is not None:
            y = self._chain_put(y)
            z_sym = self._chain_put(z_sym)
        if self.portable:
            return self._encode_param_chain_portable(y, z_sym)
        p = self._params_chain
        B, yH, yW = y.shape[0], y.shape[1], y.shape[2]
        hyper = self._get_jit(("hyper", z_sym.shape), self._hyper_decode_fn)
        ho, z_hat = hyper(p, z_sym)
        if self.module.use_charm:
            y_prev = jnp.zeros((B, yH, yW, 0), jnp.float32)
            p0 = self._get_jit(("slice_p", 0, (B, yH, yW)),
                               lambda: self._slice_params_fn(0))
            mu, idx = p0(p, ho, y_prev)
            syms, idxs = [], []
            for i in range(self.num_slices):
                sq = self._get_jit(("symq", i, y.shape),
                                   lambda i=i: self._symbolize_fn(i))
                sym = sq(p, y, mu)
                syms.append(sym)
                idxs.append(idx)
                sf = self._get_jit(("slice_s", i, (B, yH, yW)),
                                   lambda i=i: self._slice_step_fn(i))
                y_prev, mu, idx = sf(p, ho, y_prev, sym, mu)
            cat16 = self._get_jit(("cat16",), self._concat_i16_fn)
            cat8 = self._get_jit(("cat8",), self._concat_u8_fn)
            return cat16(*syms), cat8(*idxs), y_prev, z_hat
        ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
        means, idx = ymi(p, ho)
        sq = self._get_jit(("ysymq",), self._y_symbolize_fn)
        sym = sq(p, y, means)
        dq = self._get_jit(("ydq",), self._y_dequant_fn)
        return sym, idx, dq(p, sym, means), z_hat

    def _encode_tail(self, y, z_sym, tpu_dev: bool, debug: bool) -> Dict:
        """Param chain + format-specific tail (device rANS pack | fused d2h
        symbol planes). Returns the `out` dict compress_finalize reads."""
        if self._cpu_dev is not None:
            # cpu entropy-parameter chain: the tail (coalesce) runs there
            # too, so all its operands must share the commitment
            z_sym = self._chain_put(z_sym)
        y_syms, y_idxs, y_hat, z_hat = self._encode_param_chain(y, z_sym)
        tail = (self._get_jit(("pack",), self._pack_fn) if tpu_dev
                else self._get_jit(("coalesce",), self._coalesce_fn))
        out = dict(tail(y_syms, y_idxs, z_sym, y_hat))
        # full-width fallback planes (host formats, pathological |sym|>=512,
        # and the tier-2 dense re-pack in _finalize_tpu)
        out["y_symbols"] = y_syms
        out["y_indexes"] = y_idxs
        out["z_symbols"] = z_sym
        if debug:
            out.update(y_hat=y_hat, z_hat=z_hat)
        return out

    def compress_dispatch(self, images: np.ndarray,
                          quality_ind: Optional[int] = None,
                          beta_rate: Optional[float] = None,
                          beta_vq: Optional[float] = None,
                          debug: bool = False) -> Dict:
        """Phase 1: launch the device encode (async) and start the d2h copies.
        Returns a handle for compress_finalize. Dispatching batch k+1 before
        finalizing batch k overlaps device compute with host work/transfers."""
        if quality_ind is not None:
            beta_rate, beta_vq = self.spec.quality_betas(quality_ind)
        else:
            assert beta_rate is not None and beta_vq is not None
            quality_ind = 0
        images = np.asarray(images)
        orig_B = images.shape[0]
        if self.mesh is not None and orig_B % self.mesh.devices.size:
            # Pad the batch to the mesh multiple (repeat the last image) so
            # multi-chip serving accepts any batch; finalize drops the pad.
            n = self.mesh.devices.size
            pad = (-orig_B) % n
            images = np.concatenate(
                [images, np.repeat(images[-1:], pad, axis=0)], axis=0)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        x = _pad_np(images)
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)

        from .tiling import SPLIT_RESOLUTION
        tpu_dev = (self.stream_format == "tpu"
                   and self.encode_backend == "device")
        # stats (exact/table-based pred bits) need the device tables in
        # every format now
        self._ensure_dtables()
        if max(x.shape[1], x.shape[2]) > SPLIT_RESOLUTION:
            lat, idx = self._split_vq_encode(x)
            front = self._get_jit(("front_vq",), self._front_from_vq_fn)
            y, z_sym = front(self.params, self._put_batch(x), lat, idx,
                             b1, b2)
        else:
            front = self._get_jit(("front", x.shape),
                                  lambda: self._front_fn(x.shape))
            y, z_sym = front(
                self.params,
                self._put_batch(np.ascontiguousarray(x).reshape(-1)), b1, b2)
        out = self._encode_tail(y, z_sym, tpu_dev, debug)
        # Start d2h only for the fused buffers finalize reads (everything
        # else — y_symbols/y_indexes fallback planes, debug latents — stays
        # on device unless actually fetched).
        # (tpu_dev emits no sym_plane — skip missing keys rather than bail,
        # so 'stats' still prefetches; packed_y/packed_z are capacity-sized
        # and deliberately NOT prefetched: finalize fetches exact-size
        # chunk-quantized slices instead.)
        for k in ("sym_plane", "stats"):
            if k not in out:
                continue
            try:
                out[k].copy_to_host_async()
            except AttributeError:
                pass
        fmt = ("tpu_dev" if tpu_dev else
               "tpu_host" if self.stream_format == "tpu" else "compressai")
        return dict(out=out, B=B, orig_B=orig_B, H=H, W=W,
                    quality_ind=quality_ind, debug=debug, fmt=fmt)

    def compress_finalize(self, handle: Dict) -> List[Dict]:
        """Phase 2: pull the coded streams (tpu+device backend) or symbol
        planes + host entropy encode (compressai format, or tpu format via
        the C coder)."""
        if handle.get("fmt") == "tpu_dev":
            return self._finalize_tpu(handle)
        out = handle["out"]
        B, H, W = handle["B"], handle["H"], handle["W"]
        quality_ind = handle["quality_ind"]
        debug = handle["debug"]
        tpu_host = handle.get("fmt") == "tpu_host"

        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        Cy = self.module.bottleneck_y
        Czm = self.module.bottleneck_z
        ny = yH * yW * Cy

        stats = np.asarray(out["stats"])
        y_bits, z_bits = stats[:B], stats[B:2 * B]
        max_abs_y = int(stats[2 * B])
        plane = np.asarray(out["sym_plane"])
        z_sym = (plane[:, ny:].view(np.int16)
                 .reshape(B, zH, zW, Czm).astype(np.int32))
        if int(stats[2 * B + 1]) < 512:
            packed = plane[:, :ny].reshape(B, yH, yW, Cy)
            y_sym = (packed & 1023).astype(np.int32) - 512
            y_idx = (packed >> 10).astype(np.int32)
        else:  # pathological symbol range: fetch the full-width planes
            y_sym = np.asarray(out["y_symbols"], np.int32)
            y_idx = np.asarray(out["y_indexes"], np.int32)

        Cz = z_sym.shape[-1]
        z_idx1 = np.broadcast_to(
            np.arange(Cz, dtype=np.int32), z_sym.shape[1:]).reshape(-1)

        if self.module.use_charm:
            # The per-slice decode reads each slice's symbols contiguously:
            # reorder [H, W, C] -> [slice, H, W, slice_ch] before flattening.
            sc = y_sym.shape[-1] // self.num_slices

            def slice_major(a):
                h, w = a.shape[1], a.shape[2]
                return (a.reshape(B, h, w, self.num_slices, sc)
                         .transpose(0, 3, 1, 2, 4).reshape(B, -1))
            y_sym = slice_major(y_sym)
            y_idx = slice_major(y_idx)

        num_pixel = H * W
        if tpu_host:
            # C coder, TPU interleaved stream format (device-decodable)
            from ..ops.rans import tpu_encode_sections

            y_sym_f = y_sym.reshape(B, -1)
            y_idx_f = y_idx.reshape(B, -1)

            def y_sections(b):
                segs = []
                N = y_sym_f.shape[1]
                ns = N // self.num_slices if self.module.use_charm else N
                for s0 in range(0, N, ns):
                    L = section_lanes(ns, self.lanes)
                    segs.append((y_sym_f[b, s0:s0 + ns].reshape(-1, L),
                                 y_idx_f[b, s0:s0 + ns].reshape(-1, L)))
                return segs

            Lz = section_lanes(z_idx1.size, self.lanes)
            z_futs = [self._pool.submit(
                tpu_encode_sections,
                [(z_sym[b].reshape(-1, Lz), z_idx1.reshape(-1, Lz))],
                self.z_table, True) for b in range(B)]
            y_futs = [self._pool.submit(tpu_encode_sections, y_sections(b),
                                        self.y_table, True)
                      for b in range(B)]
        else:
            z_futs = [self._pool.submit(
                encode_with_indexes, z_sym[b].reshape(-1), z_idx1,
                self.z_table) for b in range(B)]
            y_futs = [self._pool.submit(
                encode_with_indexes, y_sym[b].reshape(-1),
                y_idx[b].reshape(-1), self.y_table) for b in range(B)]
        results = []
        for b in range(B):
            if tpu_host:
                z_str, z_esc, z_t2 = z_futs[b].result()
                y_str, y_esc, y_t2 = y_futs[b].result()
                esc_dense = bool(self._esc_dense_flags(
                    handle, np.array([y_esc]), np.array([z_esc]))[0])
                t2free = not (y_t2 or z_t2)
                escfree = y_esc == 0 and z_esc == 0
            else:
                z_str = z_futs[b].result()
                y_str = y_futs[b].result()
                esc_dense = False
                t2free = False
                escfree = False
            header = HeaderHandler.encode((H, W), max_abs_y, quality_ind,
                                          tpu_format=tpu_host,
                                          lanes=self.lanes,
                                          esc_dense=esc_dense,
                                          t2free=t2free,
                                          escfree=escfree,
                                          portable=self.portable,
                                          encode_batch=B,
                                          fast_entropy=self._fast_entropy,
                                          bf16=self._bf16)
            r = dict(
                string_list=[header, z_str, y_str],
                pred_y_bpp=float(y_bits[b]) / num_pixel,
                pred_z_bpp=float(z_bits[b]) / num_pixel,
                num_pixel=num_pixel,
            )
            if debug:
                r["y_hat"] = np.asarray(out["y_hat"][b])
                r["z_hat"] = np.asarray(out["z_hat"][b])
            results.append(r)
        return results[:handle.get("orig_B", B)]

    def _esc_dense_flags(self, handle: Dict, y_escmax, z_escmax):
        """Per-image dense-escape header flags: True when some section's
        escape count exceeds the sparse decode epilogue's static capacity
        (ops/rans_device.esc_cap), so the decoder must build the dense
        (uncapped) variant of the decode graph for this stream."""
        from ..ops.rans_device import esc_cap
        H, W = handle["H"], handle["W"]
        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        Cy, Cz = self.module.bottleneck_y, self.module.bottleneck_z
        lo, hi = self._tpu_y_sections(Cy)[0]  # all sections equal-sized
        ny, nz = yH * yW * (hi - lo), zH * zW * Cz
        return ((np.asarray(y_escmax) > esc_cap(ny))
                | (np.asarray(z_escmax) > esc_cap(nz)))

    def _finalize_tpu(self, handle: Dict) -> List[Dict]:
        """Fetch the device-coded streams: one small stats read, then the
        packed word buffers sliced to their real length (chunk-quantized so
        the slice executables cache)."""
        out = handle["out"]
        B, H, W = handle["B"], handle["H"], handle["W"]
        stats = np.asarray(out["stats"])
        y_bits, z_bits = stats[:B], stats[B:2 * B]
        max_abs_y = int(stats[2 * B])

        def f32_join(seg):  # inverse of _pack_fn's f32_split
            return (seg[:B].astype(np.int64) << 12) | seg[B:].astype(np.int64)
        y_counts = f32_join(stats[2 * B + 2: 2 * B + 2 + 2 * B])
        z_counts = f32_join(stats[2 * B + 2 + 2 * B: 2 * B + 2 + 4 * B])
        y_escmax = stats[2 * B + 2 + 4 * B: 2 * B + 2 + 5 * B].astype(np.int64)
        z_escmax = stats[2 * B + 2 + 5 * B: 2 * B + 2 + 6 * B].astype(np.int64)
        from ..ops.rans_device import CLIP_POISON
        # Three-tier speculative pack. The dispatched pack is escfree=True
        # (NO side-channel slots — one compaction update per symbol; every
        # realistic low-bpp stream has zero escapes). Its exact escape
        # counts certify, per image, the escfree container bit that unlocks
        # the decoder's epilogue-free fast path. On a miss (any escape in
        # the batch) re-pack through the clipped executable (tier-1 slots,
        # no tier-2); if THAT poisons (tier-2 would fire — pathological
        # symbols only), escalate to the dense pack.
        t2free = True
        if (y_escmax > 0).any() or (z_escmax > 0).any():
            def repack(d):
                nonlocal y_counts, z_counts, y_bits, z_bits
                nonlocal y_escmax, z_escmax, out
                y_counts = np.asarray(d["y_counts"]).astype(np.int64)
                z_counts = np.asarray(d["z_counts"]).astype(np.int64)
                y_bits = y_counts.astype(np.float64) * 16.0
                z_bits = z_counts.astype(np.float64) * 16.0
                y_escmax = np.asarray(d["y_escmax"]).astype(np.int64)
                z_escmax = np.asarray(d["z_escmax"]).astype(np.int64)
                out = dict(out, packed_y=d["packed_y"],
                           packed_z=d["packed_z"])

            repack(self._get_jit(("pack_clip",), self._pack_clipped_fn)(
                out["y_symbols"], out["y_indexes"], out["z_symbols"]))
            if ((y_escmax >= CLIP_POISON).any()
                    or (z_escmax >= CLIP_POISON).any()):
                repack(self._get_jit(("pack_dense",), self._pack_dense_fn)(
                    out["y_symbols"], out["y_indexes"], out["z_symbols"]))
                t2free = False
        # per-image certification: an image with zero escapes has identical
        # bytes under every pack tier, so its bit survives a batch re-pack
        escfree = (y_escmax == 0) & (z_escmax == 0)
        esc_dense = self._esc_dense_flags(handle, y_escmax, z_escmax)
        if (y_counts.sum() > out["packed_y"].shape[0]
                or z_counts.sum() > out["packed_z"].shape[0]):
            raise RuntimeError(
                "tpu-format stream word counts exceed the packed buffer "
                f"capacity (y={y_counts.sum()}/{out['packed_y'].shape[0]}, "
                f"z={z_counts.sum()}/{out['packed_z'].shape[0]}) — "
                "corrupt encode stats")
        ch = self._WORD_CHUNK

        def fetch(packed, total):
            n = min(-(-int(total) // ch) * ch, packed.shape[0])
            return np.asarray(packed[:n])

        py = fetch(out["packed_y"], y_counts.sum())
        pz = fetch(out["packed_z"], z_counts.sum())
        y_off = np.concatenate([[0], np.cumsum(y_counts)])
        z_off = np.concatenate([[0], np.cumsum(z_counts)])

        num_pixel = H * W
        results = []
        for b in range(B):
            header = HeaderHandler.encode((H, W), max_abs_y,
                                          handle["quality_ind"],
                                          tpu_format=True, lanes=self.lanes,
                                          esc_dense=bool(esc_dense[b]),
                                          t2free=t2free,
                                          escfree=bool(escfree[b]),
                                          portable=self.portable,
                                          encode_batch=B,
                                          fast_entropy=self._fast_entropy,
                                          bf16=self._bf16)
            r = dict(
                string_list=[header,
                             pz[z_off[b]:z_off[b + 1]].tobytes(),
                             py[y_off[b]:y_off[b + 1]].tobytes()],
                pred_y_bpp=float(y_bits[b]) / num_pixel,
                pred_z_bpp=float(z_bits[b]) / num_pixel,
                num_pixel=num_pixel,
            )
            if handle["debug"]:
                r["y_hat"] = np.asarray(out["y_hat"][b])
                r["z_hat"] = np.asarray(out["z_hat"][b])
            results.append(r)
        return results[:handle.get("orig_B", B)]

    def compress(self, images: np.ndarray, quality_ind: Optional[int] = None,
                 beta_rate: Optional[float] = None,
                 beta_vq: Optional[float] = None,
                 debug: bool = False) -> List[Dict]:
        """images: [B, H, W, 3] float in [-1, 1] (unpadded). Returns one dict
        per image with string_list [header, z_str, y_str] + rate stats.
        debug=True additionally returns y_hat/z_hat for parity checks."""
        return self.compress_finalize(self.compress_dispatch(
            images, quality_ind, beta_rate, beta_vq, debug))

    # ------------------------------------------------------------------
    def decompress(self, string_lists: List[List[bytes]],
                   defer_fetch: bool = False) -> np.ndarray:
        """Batched decode of same-resolution, same-quality bitstreams.
        Returns images [B, H, W, 3] uint8."""
        headers = [HeaderHandler.decode(s[0]) for s in string_lists]
        H, W = headers[0]["img_size"]
        q = headers[0]["quality_ind"]
        fmt = headers[0]["stream_format"]
        portable = headers[0]["portable"]
        assert all(h["img_size"] == (H, W) for h in headers)
        assert all(h["quality_ind"] == q for h in headers)
        assert all(h["stream_format"] == fmt for h in headers)
        assert all(h["portable"] == portable for h in headers), (
            "mixed portable/non-portable streams in one decode batch")
        if fmt == "tpu":
            # entropy_precision / codec_dtype change the bytes a stream's
            # entropy parameters are derived with: a decoder built with the
            # other setting desyncs silently. Fail fast on the recorded
            # config instead (legacy <=8-byte headers carry no record and
            # skip the check).
            for h in headers:
                for key, mine, knob in (
                        ("fast_entropy", self._fast_entropy,
                         "entropy_precision"),
                        ("bf16", self._bf16, "codec_dtype")):
                    if h[key] is not None and h[key] != mine:
                        raise ValueError(
                            f"stream was encoded with {knob} "
                            f"{'fast' if h[key] else 'high/f32'} but this "
                            f"codec is built with the other setting — "
                            "entropy parameters would not reproduce and the "
                            f"decode would desync. Rebuild the model with a "
                            f"matching `{knob}` config to decode this "
                            "stream")
        if fmt == "tpu" and not portable:
            # Non-portable streams are only guaranteed decodable by the
            # encoder's executable configuration (PERF.md §8b). The header
            # records the encode batch; fail fast on a mismatch instead of
            # risking a silent lowering-dependent desync (legacy 6-byte
            # headers carry no record and skip the check).
            run_B = self._mesh_pad(len(string_lists))
            for h in headers:
                eb = h["encode_batch"]
                if eb and eb != run_B:
                    raise ValueError(
                        f"non-portable tpu stream was encoded at batch "
                        f"{eb} but this decode runs at batch {run_B}: "
                        "batch-B executables are different XLA lowerings "
                        "and entropy parameters may not reproduce. Decode "
                        f"in groups of {eb}, or re-encode with "
                        "Codec(portable=True) for batch-independent "
                        "streams")
        return self.decompress_raw(
            [s[1] for s in string_lists], [s[2] for s in string_lists],
            (H, W), beta_rate=self.spec.quality_betas(q)[0],
            beta_vq=self.spec.quality_betas(q)[1], defer_fetch=defer_fetch,
            stream_format=fmt, lanes=headers[0]["lanes"],
            esc_dense=any(bool(h["esc_dense"]) for h in headers)
            if fmt == "tpu" else False, portable=portable,
            t2free=all(bool(h["t2free"]) for h in headers)
            if fmt == "tpu" else False,
            escfree=all(bool(h["escfree"]) for h in headers)
            if fmt == "tpu" else False)

    def decompress_raw(self, z_strs: List[bytes], y_strs: List[bytes],
                       img_size: Tuple[int, int], beta_rate: float,
                       beta_vq: float, defer_fetch: bool = False,
                       stream_format: Optional[str] = None,
                       lanes: Optional[int] = None,
                       esc_dense: bool = False,
                       portable: bool = False,
                       t2free: bool = False,
                       escfree: bool = False) -> np.ndarray:
        """defer_fetch=True returns a PendingImages handle with the d2h copy
        already started — call .fetch() later to overlap the transfer with
        the next batch's compute. portable=True decodes the entropy
        parameters through the canonical batch-1 executables (streams
        written by a portable encoder — decompress() reads the header
        flag)."""
        H, W = img_size
        orig_B = len(z_strs)
        if self._mesh_pad(orig_B) != orig_B:
            # mesh batch padding: repeat the last stream, drop its outputs
            pad = self._mesh_pad(orig_B) - orig_B
            z_strs = list(z_strs) + [z_strs[-1]] * pad
            y_strs = list(y_strs) + [y_strs[-1]] * pad
        B = len(z_strs)
        keep = None if B == orig_B else orig_B
        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        Cz = self.module.bottleneck_z
        Cy = self.module.bottleneck_y

        if (stream_format or self.stream_format) == "tpu":
            return self._decompress_tpu(z_strs, y_strs, (H, W), beta_rate,
                                        beta_vq, defer_fetch,
                                        lanes=lanes or self.lanes,
                                        esc_dense=esc_dense,
                                        portable=portable, keep=keep,
                                        t2free=t2free, escfree=escfree)

        # z: factorized decode, one shot per image (parallel across images)
        z_idx1 = np.broadcast_to(np.arange(Cz, dtype=np.int32),
                                 (zH, zW, Cz)).reshape(-1)
        z_sym = np.stack(list(self._pool.map(
            lambda s: decode_with_indexes(s, z_idx1, self.z_table)
            .reshape(zH, zW, Cz), z_strs))).astype(np.int16)

        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)

        if portable:
            # canonical per-image chain — matches the portable encoder's
            # batch-1 executables regardless of this decode's grouping
            y_hat, _ = self._host_decode_params_portable(
                z_sym, y_strs, B, yH, yW, Cy)
        else:
            hyper = self._get_jit(("hyper", (B, zH, zW, Cz)),
                                  self._hyper_decode_fn)
            hyper_out, _ = hyper(self._params_chain, self._chain_put(z_sym))
            if self.module.use_charm:
                y_hat = self._charm_decode(hyper_out, y_strs, B, yH, yW, Cy)
            else:
                # shared executables with the encode pipeline — idx/means
                # must match the encoder bitwise (see _encode_param_chain)
                ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
                means, idx8 = ymi(self._params_chain, hyper_out)
                idx = np.asarray(idx8, np.int32)
                sym = np.stack([
                    decode_with_indexes(s, idx[b].reshape(-1), self.y_table)
                    .reshape(yH, yW, Cy)
                    for b, s in enumerate(y_strs)])
                dq = self._get_jit(("ydq",), self._y_dequant_fn)
                y_hat = dq(self._params_chain,
                           self._chain_put(sym.astype(np.int16)), means)
        if self._cpu_dev is not None:
            # chain ran on CPU; reconstruction runs on the accelerator
            y_hat = jax.device_put(y_hat, self._accel_dev)

        from .tiling import SPLIT_RESOLUTION
        if max(H, W) > SPLIT_RESOLUTION:
            fake = self._split_reconstruct(y_hat, b1, b2, B, padH, padW)
            try:
                fake.copy_to_host_async()
            except AttributeError:
                pass
            pending = PendingImages(fake, (B, padH, padW, H, W), keep=keep)
            return pending if defer_fetch else pending.fetch()

        recon = self._get_jit(("recon_flat", (B, yH, yW, Cy)), self._recon_fn)
        fake = recon(self.params, y_hat, b1, b2)  # flat uint8 [B*padH*padW*3]
        try:
            fake.copy_to_host_async()
        except AttributeError:
            pass
        pending = PendingImages(fake, (B, padH, padW, H, W), keep=keep)
        return pending if defer_fetch else pending.fetch()

    def _host_decode_params_portable(self, z_sym: np.ndarray,
                                     y_strs: List[bytes],
                                     B, yH, yW, Cy):
        """Host-coded formats, portable streams: run hyper + the y param
        chain per image at the canonical batch-1 shape (the executables a
        batch-1 codec compiles), then stack y_hat for the batched
        reconstruction. Symbol decode stays on the host per image (the
        streams are per-image by construction). Returns (y_hat, z_hat)."""
        hyper = self._get_jit(("hyper", (1,) + z_sym.shape[1:]),
                              self._hyper_decode_fn)
        z_dev = self._chain_put(z_sym)
        y_hats, z_hats = [], []
        for b in range(B):
            ho, zh = hyper(self._params_chain, z_dev[b:b + 1])
            z_hats.append(zh)
            if self.module.use_charm:
                y_hats.append(self._charm_decode(
                    ho, [y_strs[b]], 1, yH, yW, Cy))
            else:
                ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
                means, idx8 = ymi(self._params_chain, ho)
                idx = np.asarray(idx8, np.int32)
                sym = decode_with_indexes(
                    y_strs[b], idx.reshape(-1),
                    self.y_table).reshape(1, yH, yW, Cy)
                dq = self._get_jit(("ydq",), self._y_dequant_fn)
                y_hats.append(dq(self._params_chain, self._chain_put(
                    sym.astype(np.int16)), means))
        if B == 1:
            return y_hats[0], z_hats[0]
        stack = self._get_jit(("stack0",), self._stack0_fn)
        return stack(*y_hats), stack(*z_hats)

    def _decode_pipeline(self, z_words, z_base, y_words, y_base,
                         B, zH, zW, yH, yW, lanes: int, sparse_esc: bool,
                         recon: bool, b1, b2,
                         portable: bool = False,
                         tier2: bool = True,
                         escfree: bool = False) -> Dict:
        """tpu-format decode as a chain of executables: z scan -> hyper ->
        per-slice (shared params/step + y-section scan) -> optional
        reconstruction. All dispatches are async; nothing blocks until the
        caller fetches. Returns {y_hat, z_hat, consumed_words[, img]}.
        portable=True derives the entropy parameters through the canonical
        batch-1 executables (matching a portable encoder's, regardless of
        this decode's batch); the integer entropy scans and the
        reconstruction stay batched either way."""
        if portable:
            return self._decode_pipeline_portable(
                z_words, z_base, y_words, y_base, B, zH, zW, yH, yW,
                lanes, sparse_esc, recon, b1, b2, tier2=tier2,
                escfree=escfree)
        p = self.params
        Cy = self.module.bottleneck_y
        zdec = self._get_jit(("zdec", B, zH, zW, lanes, sparse_esc, tier2,
                              escfree),
                             lambda: self._zdec_fn(B, zH, zW, lanes,
                                                   sparse_esc, tier2,
                                                   escfree))
        z_sym, z_cursor = zdec(z_words, z_base)
        hyper = self._get_jit(("hyper", z_sym.shape), self._hyper_decode_fn)
        ho, z_hat = hyper(p, z_sym)
        cursor = jnp.zeros((B,), jnp.int32)
        if self.module.use_charm:
            sc = Cy // self.num_slices
            L = section_lanes(yH * yW * sc, lanes)
            y_prev = jnp.zeros((B, yH, yW, 0), jnp.float32)
            p0 = self._get_jit(("slice_p", 0, (B, yH, yW)),
                               lambda: self._slice_params_fn(0))
            mu, idx = p0(p, ho, y_prev)
            state = jnp.zeros((B, L), jnp.uint32)  # ignored by first=True
            for i in range(self.num_slices):
                yd = self._get_jit(
                    ("ysec", i == 0, B, yH, yW, sc, lanes, sparse_esc,
                     tier2, escfree),
                    lambda f=(i == 0): self._ysec_fn(f, B, yH, yW, sc,
                                                     lanes, sparse_esc,
                                                     tier2, escfree))
                sym, cursor, state = yd(y_words, y_base, cursor, state, idx)
                sf = self._get_jit(("slice_s", i, (B, yH, yW)),
                                   lambda i=i: self._slice_step_fn(i))
                y_prev, mu, idx = sf(p, ho, y_prev, sym, mu)
            y_hat = y_prev
        else:
            ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
            means, idx = ymi(p, ho)
            yd = self._get_jit(
                ("ysec", True, B, yH, yW, Cy, lanes, sparse_esc, tier2,
                 escfree),
                lambda: self._ysec_fn(True, B, yH, yW, Cy, lanes,
                                      sparse_esc, tier2, escfree))
            state = jnp.zeros(
                (B, section_lanes(yH * yW * Cy, lanes)), jnp.uint32)
            sym, cursor, state = yd(y_words, y_base, cursor, state, idx)
            dq = self._get_jit(("ydq",), self._y_dequant_fn)
            y_hat = dq(p, sym, means)
        res = dict(y_hat=y_hat, z_hat=z_hat,
                   consumed_words=jnp.stack([z_cursor, cursor], axis=0))
        if recon:
            rec = self._get_jit(("recon_flat", (B, yH, yW, Cy)),
                                self._recon_fn)
            res["img"] = rec(p, y_hat, b1, b2)
        return res

    def _decode_pipeline_portable(self, z_words, z_base, y_words, y_base,
                                  B, zH, zW, yH, yW, lanes: int,
                                  sparse_esc: bool, recon: bool,
                                  b1, b2, tier2: bool = True,
                                  escfree: bool = False) -> Dict:
        """Portable-stream decode: the z/y entropy scans run batched (pure
        integer programs — exact under any lowering), but every FLOAT that
        gates symbol interpretation (hyper_out, per-slice mu, y_hat_prev,
        non-charm means) is computed per image at the canonical batch-1
        shape, mirroring _encode_param_chain_portable. Integers (decoded
        symbol planes, cdf indexes) are sliced/stacked across the
        per-image <-> batched boundary, which is exact by construction.
        Under a mesh the canonical chain runs on mesh device 0 and stacked
        results reshard into the batched scans (see __init__)."""
        p = self._canon_params() if self.mesh is not None else self.params
        Cy = self.module.bottleneck_y
        stk = self._stack_canon
        cput = self._canon_put

        zdec = self._get_jit(("zdec", B, zH, zW, lanes, sparse_esc, tier2,
                              escfree),
                             lambda: self._zdec_fn(B, zH, zW, lanes,
                                                   sparse_esc, tier2,
                                                   escfree))
        z_sym, z_cursor = zdec(z_words, z_base)
        hyper = self._get_jit(("hyper", (1,) + z_sym.shape[1:]),
                              self._hyper_decode_fn)
        hos, zhs = [], []
        for b in range(B):
            ho_b, zh_b = hyper(p, cput(z_sym[b:b + 1]))
            hos.append(ho_b)
            zhs.append(zh_b)
        z_hat = stk(zhs)
        cursor = jnp.zeros((B,), jnp.int32)
        if self.module.use_charm:
            sc = Cy // self.num_slices
            L = section_lanes(yH * yW * sc, lanes)
            p0 = self._get_jit(("slice_p", 0, (1, yH, yW)),
                               lambda: self._slice_params_fn(0))
            y_prevs = [jnp.zeros((1, yH, yW, 0), jnp.float32)] * B
            mus, idxs = [], []
            for b in range(B):
                mu_b, idx_b = p0(p, hos[b], y_prevs[b])
                mus.append(mu_b)
                idxs.append(idx_b)
            state = jnp.zeros((B, L), jnp.uint32)  # ignored by first=True
            for i in range(self.num_slices):
                yd = self._get_jit(
                    ("ysec", i == 0, B, yH, yW, sc, lanes, sparse_esc,
                     tier2, escfree),
                    lambda f=(i == 0): self._ysec_fn(f, B, yH, yW, sc,
                                                     lanes, sparse_esc,
                                                     tier2, escfree))
                sym, cursor, state = yd(y_words, y_base, cursor, state,
                                        stk(idxs))
                sf = self._get_jit(("slice_s", i, (1, yH, yW)),
                                   lambda i=i: self._slice_step_fn(i))
                for b in range(B):
                    y_prevs[b], mus[b], idxs[b] = sf(
                        p, hos[b], y_prevs[b], cput(sym[b:b + 1]), mus[b])
            y_hat = stk(y_prevs)
        else:
            ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
            means, idxs = [], []
            for b in range(B):
                m_b, i_b = ymi(p, hos[b])
                means.append(m_b)
                idxs.append(i_b)
            yd = self._get_jit(
                ("ysec", True, B, yH, yW, Cy, lanes, sparse_esc, tier2,
                 escfree),
                lambda: self._ysec_fn(True, B, yH, yW, Cy, lanes,
                                      sparse_esc, tier2, escfree))
            state = jnp.zeros(
                (B, section_lanes(yH * yW * Cy, lanes)), jnp.uint32)
            sym, cursor, state = yd(y_words, y_base, cursor, state,
                                    stk(idxs))
            dq = self._get_jit(("ydq",), self._y_dequant_fn)
            y_hat = stk([dq(p, cput(sym[b:b + 1]), means[b])
                         for b in range(B)])
        res = dict(y_hat=y_hat, z_hat=z_hat,
                   consumed_words=jnp.stack([z_cursor, cursor], axis=0))
        if recon:
            rec = self._get_jit(("recon_flat", (B, yH, yW, Cy)),
                                self._recon_fn)
            # reconstruction is the batched (mesh-replicated-params) stage,
            # not part of the canonical chain
            res["img"] = rec(self.params, y_hat, b1, b2)
        return res

    def _decompress_tpu(self, z_strs: List[bytes], y_strs: List[bytes],
                        img_size: Tuple[int, int], beta_rate: float,
                        beta_vq: float, defer_fetch: bool = False,
                        include_latents: bool = False,
                        lanes: Optional[int] = None,
                        esc_dense: bool = False,
                        portable: bool = False,
                        keep: Optional[int] = None,
                        t2free: bool = False,
                        escfree: bool = False):
        """Decode device-coded streams: upload the word buffers, run the
        shared-executable pipeline (z decode -> hyper -> ChARM chain with
        device rANS sections -> reconstruction), download flat uint8 pixels.
        The entropy-parameter executables are the SAME objects the encoder
        dispatched (see _encode_param_chain), so mu/sigma/y_hat_prev match
        the encoder bitwise by construction."""
        H, W = img_size
        B = len(z_strs)
        self._ensure_dtables()
        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        lanes = lanes or self.lanes
        y_cap, z_cap = self._tpu_caps(B, yH, yW, zH, zW, lanes)
        y_words, y_base = self._upload_words(y_strs, y_cap)
        z_words, z_base = self._upload_words(z_strs, z_cap)
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)

        from .tiling import SPLIT_RESOLUTION
        split = max(H, W) > SPLIT_RESOLUTION
        recon = not split and not include_latents
        out = self._decode_pipeline(z_words, z_base, y_words, y_base,
                                    B, zH, zW, yH, yW, lanes,
                                    sparse_esc=not esc_dense,
                                    recon=recon, b1=b1, b2=b2,
                                    portable=portable, tier2=not t2free,
                                    escfree=escfree)
        check = lambda: self._check_consumed(out["consumed_words"],
                                             z_strs, y_strs)
        if include_latents:
            check()
            return out
        if split:
            fake = self._split_reconstruct(out["y_hat"], b1, b2, B,
                                           padH, padW)
            try:
                fake.copy_to_host_async()
            except AttributeError:
                pass
            check()
            pending = PendingImages(fake, (B, padH, padW, H, W), keep=keep)
            return pending if defer_fetch else pending.fetch()
        img = out["img"]
        try:
            img.copy_to_host_async()
            out["consumed_words"].copy_to_host_async()
        except AttributeError:
            pass
        # validated at fetch time — the tiny consumed_words d2h rides along
        # with the image transfer instead of forcing an extra sync here
        pending = PendingImages(img, (B, padH, padW, H, W), check=check,
                                keep=keep)
        return pending if defer_fetch else pending.fetch()

    def bench_device_cycle(self, images: np.ndarray,
                           quality_ind: Optional[int] = None,
                           beta_rate: Optional[float] = None,
                           beta_vq: Optional[float] = None,
                           iters: int = 3) -> Dict[str, float]:
        """Time the pure DEVICE pipelines of one codec cycle — the encode
        chain (front -> shared param chain -> device rANS pack) and the
        tpu-format decode chain — with every input already resident on
        device. Each chain is async-dispatched end to end and blocked once,
        so the measurement includes dispatch overhead but excludes the host
        link, h2d/d2h transfers, and host entropy coding — stable under
        shared-link weather, regressions attributable to the graphs
        (bench.py reports it as "device_only"). Returns median seconds per
        batch for each chain."""
        import time as _time
        assert self.stream_format == "tpu", "device cycle needs tpu format"
        if quality_ind is not None:
            beta_rate, beta_vq = self.spec.quality_betas(quality_ind)
        images = np.asarray(images)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        x = _pad_np(images)
        b1 = jnp.array([beta_rate], jnp.float32)
        b2 = jnp.array([beta_vq], jnp.float32)

        self._ensure_dtables()
        front = self._get_jit(("front", x.shape),
                              lambda: self._front_fn(x.shape))
        x_dev = jax.block_until_ready(
            self._put_batch(np.ascontiguousarray(x).reshape(-1)))

        def run_enc():
            y, z_sym = front(self.params, x_dev, b1, b2)
            out = self._encode_tail(y, z_sym, tpu_dev=True, debug=False)
            return jax.block_until_ready((out["stats"], out["packed_y"],
                                          out["packed_z"]))
        run_enc()  # compile/warm
        enc_times = []
        for _ in range(iters):
            t0 = _time.perf_counter()
            run_enc()
            enc_times.append(_time.perf_counter() - t0)

        # streams once (any path), then stage the decode pipeline inputs
        res = self.compress(images, beta_rate=beta_rate, beta_vq=beta_vq)
        z_strs = [r["string_list"][1] for r in res]
        y_strs = [r["string_list"][2] for r in res]
        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        y_cap, z_cap = self._tpu_caps(B, yH, yW, zH, zW, self.lanes)
        y_words, y_base = self._upload_words(y_strs, y_cap)
        z_words, z_base = self._upload_words(z_strs, z_cap)
        jax.block_until_ready((y_words, z_words))
        esc_dense = any(
            bool(HeaderHandler.decode(r["string_list"][0])["esc_dense"])
            for r in res)
        t2free = all(
            bool(HeaderHandler.decode(r["string_list"][0])["t2free"])
            for r in res)
        escfree = all(
            bool(HeaderHandler.decode(r["string_list"][0])["escfree"])
            for r in res)

        def run_dec():
            out = self._decode_pipeline(z_words, z_base, y_words, y_base,
                                        B, zH, zW, yH, yW, self.lanes,
                                        sparse_esc=not esc_dense,
                                        recon=True, b1=b1, b2=b2,
                                        portable=self.portable,
                                        tier2=not t2free, escfree=escfree)
            return jax.block_until_ready((out["img"],
                                          out["consumed_words"]))
        run_dec()
        dec_times = []
        for _ in range(iters):
            t0 = _time.perf_counter()
            run_dec()
            dec_times.append(_time.perf_counter() - t0)
        return {"enc_s": float(np.median(enc_times)),
                "dec_s": float(np.median(dec_times))}

    @staticmethod
    def _check_consumed(consumed, z_strs: List[bytes], y_strs: List[bytes]):
        """Stream-integrity check: the decode scans must consume exactly the
        words each stream contains (flush + renorm + side channel account for
        every encoder-emitted word). A truncated/corrupt/mismatched stream
        desynchronizes the renorm pattern and fails here instead of silently
        decoding garbage pixels."""
        got = np.asarray(consumed)  # [2, B] = (z, y) final cursors
        from ..ops.rans_device import ESC_POISON
        if np.any(got >= ESC_POISON):
            raise RuntimeError(
                "tpu-format decode escape-epilogue poison: a section has "
                "more escapes than the sparse epilogue's capacity, or an "
                "escape appeared in a stream whose header certifies it "
                "escape-free / tier-2-free — corrupt stream or mis-flagged "
                "encoder")
        want_z = np.array([len(s) // 2 for s in z_strs], got.dtype)
        want_y = np.array([len(s) // 2 for s in y_strs], got.dtype)
        if not (np.array_equal(got[0], want_z)
                and np.array_equal(got[1], want_y)):
            raise RuntimeError(
                "tpu-format stream integrity check failed: decode consumed "
                f"z={got[0].tolist()} / y={got[1].tolist()} words, streams "
                f"contain z={want_z.tolist()} / y={want_y.tolist()} — "
                "corrupt or mismatched bitstream")

    def verify_roundtrip(self, results: List[Dict],
                         string_lists: List[List[bytes]],
                         img_size: Tuple[int, int]) -> bool:
        """Operational self-check: the decode-side y_hat reconstruction must
        equal the encoder's bit-exactly (the reference's commented-out
        allclose hook, scripts/compress.py:137-138, made runnable). Requires
        results from compress(..., debug=True)."""
        H, W = img_size
        if self._mesh_pad(len(string_lists)) != len(string_lists):
            # mesh batch padding (dropped from the comparison below, which
            # iterates over `results` only)
            pad = self._mesh_pad(len(string_lists)) - len(string_lists)
            string_lists = list(string_lists) + [string_lists[-1]] * pad
        B = len(string_lists)
        hdr = HeaderHandler.decode(string_lists[0][0])
        fmt = hdr["stream_format"]
        portable = hdr["portable"]
        if fmt == "tpu":
            br, bv = self.spec.quality_betas(hdr["quality_ind"])
            out = self._decompress_tpu(
                [s[1] for s in string_lists], [s[2] for s in string_lists],
                (H, W), br, bv, include_latents=True, lanes=hdr["lanes"],
                esc_dense=any(
                    bool(HeaderHandler.decode(s[0])["esc_dense"])
                    for s in string_lists),
                t2free=all(
                    bool(HeaderHandler.decode(s[0])["t2free"])
                    for s in string_lists),
                escfree=all(
                    bool(HeaderHandler.decode(s[0])["escfree"])
                    for s in string_lists),
                portable=portable)
            y_hat = np.asarray(out["y_hat"])
            z_hat = np.asarray(out["z_hat"])
            return all(
                np.array_equal(y_hat[b], r["y_hat"])
                and np.array_equal(z_hat[b], r["z_hat"])
                for b, r in enumerate(results))
        padH = -(-H // self.model_stride) * self.model_stride
        padW = -(-W // self.model_stride) * self.model_stride
        zH, zW = padH // self.model_stride, padW // self.model_stride
        yH, yW = padH // self.y_stride, padW // self.y_stride
        Cz, Cy = self.module.bottleneck_z, self.module.bottleneck_y

        z_idx1 = np.broadcast_to(np.arange(Cz, dtype=np.int32),
                                 (zH, zW, Cz)).reshape(-1)
        z_sym = np.stack([
            decode_with_indexes(s[1], z_idx1, self.z_table)
            .reshape(zH, zW, Cz) for s in string_lists]).astype(np.int16)
        if portable:
            y_hat, z_hat = self._host_decode_params_portable(
                z_sym, [s[2] for s in string_lists], B, yH, yW, Cy)
            y_hat, z_hat = np.asarray(y_hat), np.asarray(z_hat)
            return all(
                np.array_equal(y_hat[b], r["y_hat"])
                and np.array_equal(z_hat[b], r["z_hat"])
                for b, r in enumerate(results))
        hyper = self._get_jit(("hyper", (B, zH, zW, Cz)),
                              self._hyper_decode_fn)
        hyper_out, z_hat = hyper(self._params_chain, self._chain_put(z_sym))
        if self.module.use_charm:
            y_hat = np.asarray(self._charm_decode(
                hyper_out, [s[2] for s in string_lists], B, yH, yW, Cy))
        else:
            ymi = self._get_jit(("ymi",), self._y_means_idx_fn)
            means, idx8 = ymi(self._params_chain, hyper_out)
            idx = np.asarray(idx8, np.int32)
            sym = np.stack([
                decode_with_indexes(s[2], idx[b].reshape(-1), self.y_table)
                .reshape(yH, yW, Cy) for b, s in enumerate(string_lists)])
            dq = self._get_jit(("ydq",), self._y_dequant_fn)
            y_hat = np.asarray(dq(self._params_chain,
                                  self._chain_put(sym.astype(np.int16)),
                                  means))
        z_hat = np.asarray(z_hat)
        ok = True
        for b, r in enumerate(results):
            ok &= bool(np.array_equal(y_hat[b], r["y_hat"]))
            ok &= bool(np.array_equal(z_hat[b], r["z_hat"]))
        return ok

    # tile-batch size for the chunked split-path executables: big enough to
    # fill the chip (the bench batch), bounding compile buckets to one shape
    _TILE_CHUNK = 16

    def _split_vq_encode(self, x: np.ndarray):
        """Tile-batched VQGAN encode for >1024px images: fixed 512px windows,
        stride 256, center-crop stitching of the pre-quant latent, then one
        full-image quantize (TPU-first form of _vq_encode_split, ref:
        hyperprior_vic_model.py:190-246).

        r5 device-resident rewrite (VERDICT r4 #6): the padded image is
        uploaded ONCE as a flat uint8 buffer; tile extraction (static
        slices), the chunked VQGAN-encode tile batches, and the /8-latent
        overlap-discard stitch all run on device — the old path re-uploaded
        every overlapping tile (2.5x the image bytes over a ~30 MB/s link)
        and round-tripped every tile latent through the host."""
        from .tiling import ENC_STRIDE, ENC_WINDOW, tile_starts
        if self.mesh is not None:
            return self._split_vq_encode_host(x)
        B, H, W, _ = x.shape
        tops = tile_starts(H, ENC_WINDOW, ENC_STRIDE)
        lefts = tile_starts(W, ENC_WINDOW, ENC_STRIDE)
        T = len(tops) * len(lefts)
        chunk = self._TILE_CHUNK
        TB = T * B
        pad = (-TB) % chunk

        ext = self._get_jit(
            ("enc_tiles", x.shape, tuple(tops), tuple(lefts), pad),
            lambda: jax.jit(lambda xf: jnp.concatenate(
                [xf.reshape(x.shape)[:, t:t + ENC_WINDOW, l:l + ENC_WINDOW]
                 for t in tops for l in lefts]
                + ([xf.reshape(x.shape)[:1, :ENC_WINDOW, :ENC_WINDOW]] * pad),
                axis=0)))
        tiles = ext(jnp.asarray(np.ascontiguousarray(x).reshape(-1)))
        vq_tile = self._get_jit(("vqtile", (chunk, ENC_WINDOW)),
                                self._vq_tile_fn)
        outs = [vq_tile(self.params, tiles[k:k + chunk])
                for k in range(0, TB + pad, chunk)]
        df = 8
        w8 = ENC_WINDOW // df
        D = int(self.module.embed_dim)
        tops8 = [t // df for t in tops]
        lefts8 = [l // df for l in lefts]

        def make_stitch():
            from .tiling import keep_region

            def f(*parts):
                lat = jnp.concatenate(parts, axis=0)[:TB]
                canvas = jnp.zeros((B, H // df, W // df, D), lat.dtype)
                k = 0
                for i, t in enumerate(tops8):
                    for j, l in enumerate(lefts8):
                        tile = lat[k * B:(k + 1) * B]
                        k += 1
                        t0, t1 = keep_region(tops8, i, w8,
                                             ENC_STRIDE // df, H // df)
                        l0, l1 = keep_region(lefts8, j, w8,
                                             ENC_STRIDE // df, W // df)
                        canvas = canvas.at[:, t0:t1, l0:l1].set(
                            tile[:, t0 - t:t1 - t, l0 - l:l1 - l])
                return canvas
            return jax.jit(f)

        # NOTE: concat is position-major [T*B]; lat[k*B:(k+1)*B] is tile k
        stitch = self._get_jit(
            ("enc_stitch", (B, H, W), tuple(tops8), tuple(lefts8)),
            make_stitch)
        h = stitch(*outs)
        quant = self._get_jit(("vqquant", h.shape), self._vq_quantize_fn)
        return quant(self.params, h)

    def _split_vq_encode_host(self, x: np.ndarray):
        """Host-stitched fallback (mesh codecs: tile batches stay [B]-major
        and batch-sharded)."""
        from .tiling import ENC_STRIDE, ENC_WINDOW, extract_tiles, stitch_tiles
        B, H, W, _ = x.shape
        tiles, tops, lefts = extract_tiles(x, ENC_WINDOW, ENC_STRIDE)
        vq_tile = self._get_jit(("vqtile", (B, ENC_WINDOW)), self._vq_tile_fn)
        T = tiles.shape[0] // B
        outs = [np.asarray(vq_tile(self.params,
                                   self._put_batch(tiles[k * B:(k + 1) * B])))
                for k in range(T)]
        df = 8
        h = stitch_tiles(
            np.concatenate(outs, axis=0),
            (B, H // df, W // df, outs[0].shape[-1]),
            [t // df for t in tops], [l // df for l in lefts],
            ENC_WINDOW // df, ENC_STRIDE // df)
        quant = self._get_jit(("vqquant", h.shape), self._vq_quantize_fn)
        return quant(self.params, self._put_batch(h))

    def _recon_tiles_fn(self, chunk: int, C: int):
        """Reconstruct one tile batch, NHWC uint8 out (split path)."""
        def f(p, tiles, b1, b2):
            return self.module.apply(
                p, tiles, b1, b2, method=self.module.reconstruct_uint8)
        return jax.jit(f)

    def _split_reconstruct(self, y_hat, b1, b2, B, padH, padW):
        """Overlap-tiled reconstruction for >1024px outputs: 32-cell y
        windows (=512px), stride 16 (=256px), overlap-discard stitching
        (TPU-first form of decode_split, ref: hyperprior_vic_model.py:
        413-473).

        r5 device-resident rewrite (VERDICT r4 #6): y_hat never leaves the
        device — tile extraction (static slices), chunked tile-batch
        reconstruction (one fixed [16, 32, 32, C] executable instead of T
        batch-B dispatches), and the overlap-discard stitch into the padded
        canvas all run on device; ONE flat uint8 buffer (1x the image area)
        crosses the link instead of every overlapping 512px tile (2.5x the
        area). Returns the flat device buffer [B*padH*padW*3]."""
        from .tiling import (DEC_STRIDE_Y, DEC_WINDOW_Y, keep_region,
                             tile_starts)
        if self.mesh is not None:
            return self._split_reconstruct_host(y_hat, b1, b2, B, padH, padW)
        C = y_hat.shape[-1]
        yH, yW = y_hat.shape[1], y_hat.shape[2]
        tops = tile_starts(yH, DEC_WINDOW_Y, DEC_STRIDE_Y)
        lefts = tile_starts(yW, DEC_WINDOW_Y, DEC_STRIDE_Y)
        T = len(tops) * len(lefts)
        chunk = self._TILE_CHUNK
        TB = T * B
        pad = (-TB) % chunk

        ext = self._get_jit(
            ("dec_tiles", y_hat.shape, tuple(tops), tuple(lefts), pad),
            lambda: jax.jit(lambda y: jnp.concatenate(
                [y[:, t:t + DEC_WINDOW_Y, l:l + DEC_WINDOW_Y]
                 for t in tops for l in lefts]
                + ([y[:1, :DEC_WINDOW_Y, :DEC_WINDOW_Y]] * pad), axis=0)))
        tiles = ext(y_hat)
        recon = self._get_jit(("recon_tiles", chunk, C),
                              lambda: self._recon_tiles_fn(chunk, C))
        outs = [recon(self.params, tiles[k:k + chunk], b1, b2)
                for k in range(0, TB + pad, chunk)]

        px = self.y_stride

        def make_stitch():
            def f(*parts):
                t_all = jnp.concatenate(parts, axis=0)[:TB]
                canvas = jnp.zeros((B, padH, padW, 3), jnp.uint8)
                k = 0
                for i, t in enumerate(tops):
                    for j, l in enumerate(lefts):
                        tile = t_all[k * B:(k + 1) * B]
                        k += 1
                        t0, t1 = keep_region(tops, i, DEC_WINDOW_Y,
                                             DEC_STRIDE_Y, padH // px)
                        l0, l1 = keep_region(lefts, j, DEC_WINDOW_Y,
                                             DEC_STRIDE_Y, padW // px)
                        canvas = canvas.at[
                            :, t0 * px:t1 * px, l0 * px:l1 * px].set(
                            tile[:, (t0 - t) * px:(t1 - t) * px,
                                 (l0 - l) * px:(l1 - l) * px])
                return canvas.reshape(-1)
            return jax.jit(f)

        stitch = self._get_jit(
            ("dec_stitch", (B, padH, padW), tuple(tops), tuple(lefts)),
            make_stitch)
        return stitch(*outs)

    def _split_reconstruct_host(self, y_hat, b1, b2, B, padH, padW):
        """Host-stitched fallback (mesh codecs). Returns np [B,padH,padW,3]
        reshaped flat for a uniform caller contract."""
        from .tiling import (DEC_STRIDE_Y, DEC_WINDOW_Y, extract_tiles,
                             stitch_tiles)
        y_np = np.asarray(y_hat)
        tiles, tops, lefts = extract_tiles(y_np, DEC_WINDOW_Y, DEC_STRIDE_Y)
        recon = self._get_jit(("recon_flat", (B, DEC_WINDOW_Y, DEC_WINDOW_Y,
                                              y_np.shape[-1])), self._recon_fn)
        T = tiles.shape[0] // B
        px = DEC_WINDOW_Y * self.y_stride
        outs = [np.asarray(recon(self.params,
                                 self._put_batch(tiles[k * B:(k + 1) * B]),
                                 b1, b2)).reshape(B, px, px, 3)
                for k in range(T)]
        return stitch_tiles(
            np.concatenate(outs, axis=0), (B, padH, padW, 3),
            tops, lefts, DEC_WINDOW_Y, DEC_STRIDE_Y,
            scale=self.y_stride).reshape(-1)

    def _charm_decode(self, hyper_out, y_strs: List[bytes], B, yH, yW, Cy):
        """Per-slice sequential host-coded decode, through the SAME slice
        executables the encoder dispatched (same jit keys incl. full batch
        shape, symbols always int16). The previous version interleaved two
        half-batch chains to overlap host rANS with device compute — but
        half-batch executables are DIFFERENT XLA lowerings, and the encoder
        symbolized against full-batch mu/sigma: bf16-boundary values can
        flip between lowerings and desynchronize the stream (the round-3
        bug class; see _encode_param_chain). Correctness wins."""
        slice_ch = Cy // self.num_slices
        decoders = [RansDecoder(s) for s in y_strs]
        y_prev = jnp.zeros((B, yH, yW, 0), jnp.float32)
        p0 = self._get_jit(("slice_p", 0, (B, yH, yW)),
                           lambda: self._slice_params_fn(0))
        mu, idx = p0(self._params_chain, hyper_out, y_prev)
        for i in range(self.num_slices):
            idx_np = np.asarray(idx, np.int32)
            sym = np.stack(list(self._pool.map(
                lambda b: decoders[b]
                .decode_stream(idx_np[b].reshape(-1), self.y_table)
                .reshape(yH, yW, slice_ch), range(B))))
            sf = self._get_jit(("slice_s", i, (B, yH, yW)),
                               lambda i=i: self._slice_step_fn(i))
            y_prev, mu, idx = sf(self._params_chain, hyper_out, y_prev,
                                 self._chain_put(sym.astype(np.int16)), mu)
        return y_prev
