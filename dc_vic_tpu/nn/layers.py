"""Reusable NN building blocks (flax.linen, NHWC layout).

TPU-first re-designs of the reference layer zoo (ref: src/models/layer/):
ELIC residual bottleneck stacks, Cheng NLAM attention, FiLM-style dual-beta
conditioning with Fourier embeddings, SFT fusion blocks, GDN. All convs use
explicit torch-equivalent padding so released PyTorch checkpoints can be
converted weight-for-weight (OIHW -> HWIO; deconv additionally flips HW and
swaps I/O).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def num_groups32(channels: int) -> int:
    """GroupNorm group count: 32 like the reference (all real configs use
    channel counts divisible by 32); falls back to the largest common divisor
    for small test configs."""
    import math
    return 32 if channels % 32 == 0 else math.gcd(32, channels)


class GroupNorm(nn.Module):
    """Drop-in replacement for nn.GroupNorm(num_groups, epsilon, dtype)
    backed by the Pallas streaming-stats kernel (ops/gn.py) — the XLA
    reduce lowering of GN stats is ~45% of the reconstruction graph's
    device time (scripts/trace_probe.py). Identical parameter tree
    (scale, bias) and flax fast-variance semantics; falls back to plain
    XLA off-TPU or at kernel-unfriendly shapes."""
    num_groups: int
    epsilon: float = 1e-6
    dtype: Optional[Dtype] = None
    act: Optional[str] = None   # 'swish' fuses the activation in-kernel

    @nn.compact
    def __call__(self, x):
        from ..ops.gn import group_norm
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        y = group_norm(x, gamma, beta, self.num_groups, self.epsilon,
                       act=self.act)
        return y.astype(self.dtype or x.dtype)


def conv_pad(k: int) -> Sequence[Tuple[int, int]]:
    p = (k - 1) // 2
    return [(p, p), (p, p)]


def _use_pallas_conv3(x, features: int) -> bool:
    """Gate for routing 3x3 convs through the Pallas kernel (ops/conv3x3.py).

    OFF by default: the kernel beats XLA's conv lowering standalone
    (105-133 vs 72-87 TF/s on the hot shapes, scripts/conv_microbench.py),
    but the full-codec A/B on the real chip measured device-only throughput
    of 8.2 img/s with the dispatch ON vs 10.1 img/s OFF — XLA fuses the
    surrounding GroupNorm/swish/residual elementwise work into its conv
    epilogues, and losing that fusion costs more than the raw kernel win
    (docs/PERF.md section 5). Set DCVIC_PALLAS_CONV=1 to enable on
    qualifying shapes (TPU, lane-aligned >=128 channels, big planes)."""
    import os
    if os.environ.get("DCVIC_PALLAS_CONV") != "1":
        return False
    import jax
    if jax.default_backend() != "tpu":
        return False
    B, H, W, C = x.shape
    # lane-aligned channels only (C=192 planes pad 25% of the MXU; measure
    # before widening the gate) and a big-enough spatial plane: at the
    # 96x64-latent shape XLA's lowering wins (87 vs 77 TF/s), from 192x128
    # up the Pallas kernel wins (133 vs ~80) — scripts/conv_microbench.py
    return (C % 128 == 0 and features % 128 == 0
            and min(C, features) >= 128
            and H % 2 == 0 and W % 2 == 0
            and H * W >= 12288 and B * H * W >= 16384)


class PallasConv3(nn.Module):
    """3x3 SAME conv via ops/conv3x3.py, with nn.Conv-compatible parameter
    names/shapes (kernel HWIO + bias) so checkpoints interchange freely with
    the XLA path."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv3x3 import conv3x3_same
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, C, self.features))
        dt = self.dtype or x.dtype
        y = conv3x3_same(x.astype(dt), kernel.astype(dt))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(dt)
        return y


def _use_int8_conv(x, features: int) -> bool:
    """Gate for the int8 MXU dispatch (DCVIC_INT8_CONV=1, TPU only).

    v5e runs int8xint8->int32 convs on the MXU's double-rate path: the
    chained-dependency probe (scripts/int8_conv_probe.py, docs/PERF.md
    section 10) measured 207-269 TOP/s vs 102-146 TF/s bf16 on the recon
    hot shapes — 1.3-2x wall-time even with the f32 dequant epilogue a
    real quantized block needs. Stream safety: every entropy-parameter
    conv (hyperdecoder, ChARM slice transforms) passes precision="high"
    and Conv only routes here when precision is None, so streams stay
    SELF-CONSISTENT (encode and decode derive identical mu/sigma and the
    roundtrip stays bit-exact) — but the gate also reaches the analysis
    transforms, so enabling it changes y/z and therefore the coded
    symbols vs the unquantized encoder (the quality probe measures that
    stream delta). Wide lane-aligned planes only — narrow convs are
    dispatch-bound and the quant/dequant passes would dominate.

    The env var is read at TRACE time: set it before the first jit trace
    (before constructing/using a Codec or trainer); a live Codec caches
    executables per shape, so flipping it mid-process yields mixed
    dispatch — build a new Codec to change the mode.

    Opt-in EXPERIMENT, not a deployment mode: the on-chip quality probe
    (scripts/int8_quality_probe.py) measured 22.6 dB recon-vs-recon PSNR
    for post-training dynamic quantization — per-layer error compounds
    through ~30 conv layers to the codec's own distortion magnitude.
    Deployable int8 needs QAT/calibration on trained weights."""
    import os
    if os.environ.get("DCVIC_INT8_CONV") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    B, H, W, C = x.shape
    return (C % 128 == 0 and features % 128 == 0
            and min(C, features) >= 128 and B * H * W >= 16384)


class Int8Conv3(nn.Module):
    """3x3 SAME conv computed on the int8 MXU path, with nn.Conv-compatible
    parameter names/shapes (kernel HWIO + bias) so checkpoints interchange
    freely with the f32/bf16 paths.

    Dynamic symmetric quantization: activations per-SAMPLE (one max-abs
    reduction over H/W/C per image — same cost class as the GroupNorm
    reductions already adjacent in the ResnetBlock; per-sample rather
    than per-batch so one outlier image cannot degrade its batchmates'
    quantization and an image's reconstruction is independent of batch
    composition), weights per-output-channel. No zero point, so SAME
    zero-padding is exact in the quantized domain. The int32 accumulator
    is dequantized in f32 and bias is applied there."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from jax import lax
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, C, self.features))
        xf = x.astype(jnp.float32)
        ax = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                 keepdims=True), 1e-12)
        xq = jnp.clip(jnp.round(xf * (127.0 / ax)), -127, 127)
        kf = kernel.astype(jnp.float32)
        aw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12)
        kq = jnp.clip(jnp.round(kf * (127.0 / aw)), -127, 127)
        y = lax.conv_general_dilated(
            xq.astype(jnp.int8), kq.astype(jnp.int8), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (ax * aw * (1.0 / (127.0 * 127.0)))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)


class Conv(nn.Module):
    """3x3/5x5/1x1 conv with torch-style symmetric padding (NHWC).

    With DCVIC_PALLAS_CONV=1, 3x3 stride-1 convs on wide-channel planes
    dispatch to the Pallas direct kernel on TPU (bit-identical parameter
    tree either way). With DCVIC_INT8_CONV=1, the same class of convs
    dispatches to the quantized int8 MXU path instead (pixels-only; see
    _use_int8_conv). Default is XLA's bf16/f32 lowering."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # precision="highest" forces true-f32 MXU passes (bf16x6). JAX's DEFAULT
    # multiplies f32 operands in bf16 — fine for the big reconstruction
    # stacks, but on the entropy-parameter path (hyperdecoder, ChARM slice
    # transforms) that costs real mantissa bits on values that gate rANS
    # indexes AND makes the result more sensitive to per-executable lowering
    # choices (PERF.md §8b). Those modules pass "highest"; the planes there
    # are tiny, so the extra passes are noise in the profile.
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if (self.kernel == 3 and self.stride == 1
                and self.precision is None
                and _use_pallas_conv3(x, self.features)):
            return PallasConv3(self.features, use_bias=self.use_bias,
                               dtype=self.dtype, name="Conv_0")(x)
        if (self.kernel == 3 and self.stride == 1
                and self.precision is None
                and _use_int8_conv(x, self.features)):
            return Int8Conv3(self.features, use_bias=self.use_bias,
                             dtype=self.dtype, name="Conv_0")(x)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=conv_pad(self.kernel),
            use_bias=self.use_bias,
            dtype=self.dtype,
            precision=self.precision,
        )(x)


class _DeclConvParams(nn.Module):
    """Declares nn.Conv's parameter tree (kernel HWIO + bias) without
    computing — lets alternate compute paths share the checkpoint layout."""
    cin: int
    cout: int
    k: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.k, self.k, self.cin, self.cout)),
                self.param("bias", nn.initializers.zeros, (self.cout,)))


class DeconvTorch(nn.Module):
    """Equivalent of torch ConvTranspose2d(k, stride=2, padding=p, output_padding=1).

    Implemented as an input-dilated convolution (lhs_dilation=2 with
    per-side padding (k-1-p, k-1-p+1)). DCVIC_SUBPIXEL_DECONV=1 switches to
    the exact sub-pixel decomposition — the four output parities as plain
    VALID convs with the kernel's parity sub-slices (k=5 -> 3x3 / 3x2 /
    2x3 / 2x2 taps, i.e. only the dilated form's nonzero products),
    interleaved depth-to-space. OFF by default: despite 4x fewer nominal
    MACs, the on-chip A/B at bench geometry measured the reconstruction
    graph ~3% SLOWER with it (550.3 vs 532.5 ms) — XLA's lowering already
    skips the zero-stuffed positions, and the four output slices +
    interleave add traffic (docs/PERF.md section 5). Identical parameter
    tree and math either way. Doubles spatial dims for even inputs.
    Converter rule for torch weights: flip kernel spatially and transpose
    (I,O)->(O,I) before the OIHW->HWIO relayout.
    """
    features: int
    kernel: int = 5
    dtype: Optional[Dtype] = None
    precision: Optional[str] = None  # see Conv.precision

    @nn.compact
    def __call__(self, x):
        import os
        k = self.kernel
        # the parity/offset mapping below is derived for k=5 (p even);
        # every deconv in the model zoo is k=5
        if k == 5 and os.environ.get("DCVIC_SUBPIXEL_DECONV", "0") == "1":
            return self._subpixel(x)
        p = (k - 1) // 2
        pad = (k - 1 - p, k - 1 - p + 1)
        y = nn.Conv(
            self.features, (k, k),
            strides=(1, 1),
            padding=[pad, pad],
            input_dilation=(2, 2),
            dtype=self.dtype,
            precision=self.precision,
        )(x)
        return y

    def _subpixel(self, x):
        # Derivation (per axis, odd k, p=(k-1)//2, output_padding=1): with
        # xd = dilate2(x) padded (k-1-p, k-p), out[2i+d] = sum_t W[t] *
        # x[(2i+d+t-p-... )] reduces to: even outputs tap x[i-(p//2)..] with
        # kernel rows W[0::2], odd outputs with rows W[1::2]. For k=5 that is
        # even: taps {i-1, i, i+1} x W[0,2,4]; odd: taps {i, i+1} x W[1,3].
        B, H, W_, C = x.shape
        kernel, bias = _DeclConvParams(C, self.features, self.kernel,
                                       name="Conv_0")()
        dt = self.dtype or x.dtype
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(dt)
        ke, ko = kernel[0::2], kernel[1::2]          # rows: even 3, odd 2
        parts = {}
        for (dh, kr) in (("e", ke), ("o", ko)):
            for (dw, kk) in (("e", kr[:, 0::2]), ("o", kr[:, 1::2])):
                o = jax.lax.conv_general_dilated(
                    xp, kk.astype(dt), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=self.precision)
                # odd parities read one position later (taps {i, i+1} are
                # padded rows {i+1, i+2} = VALID output row i+1)
                o = o[:, 1:, :, :] if dh == "o" else o[:, :H, :, :]
                o = o[:, :, 1:, :] if dw == "o" else o[:, :, :W_, :]
                parts[dh + dw] = o
        y = jnp.stack([jnp.stack([parts["ee"], parts["eo"]], axis=3),
                       jnp.stack([parts["oe"], parts["oo"]], axis=3)], axis=2)
        return (y.reshape(B, 2 * H, 2 * W_, self.features)
                + bias.astype(dt))


class PixelShuffleUp(nn.Module):
    """Conv to 4*features then depth-to-space x2 (ELIC up_conv pixel_shuffle path)."""
    features: int
    kernel: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features * 4, self.kernel, dtype=self.dtype)(x)
        B, H, W, C = y.shape
        # torch PixelShuffle semantics: channel c*4+(i*2+j) -> spatial (i,j)
        y = y.reshape(B, H, W, C // 4, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(B, H * 2, W * 2, C // 4)


def up_conv(features: int, pixel_shuffle: bool, dtype=None) -> nn.Module:
    """ELIC decoder upsampling conv (ref: elic_autoencoder.py up_conv)."""
    if pixel_shuffle:
        return PixelShuffleUp(features, kernel=5, dtype=dtype)
    return DeconvTorch(features, kernel=5, dtype=dtype)


class BottleneckResBlock(nn.Module):
    """1x1 -> relu -> 3x3 -> relu -> 1x1 residual block (ELIC 'BaseBlock')."""
    ch: int
    mid_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.mid_ch, 1, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = Conv(self.mid_ch, 3, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Conv(self.ch, 1, dtype=self.dtype)(y)
        return x + y


class ResidualBottleneckBlocks(nn.Module):
    """Stack of BottleneckResBlocks, optional outer residual
    (ref: src/models/layer/elic_layers.py)."""
    ch: int
    mid_ch: int
    num_blocks: int = 3
    res_in_res: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.num_blocks):
            y = BottleneckResBlock(self.ch, self.mid_ch, dtype=self.dtype)(y)
        if self.res_in_res:
            y = x + y
        return y


class NLAMResBlock(nn.Module):
    """Half-width 1x1/3x3/1x1 residual block used inside NLAM."""
    ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        mid = self.ch // 2
        y = nn.relu(Conv(mid, 1, dtype=self.dtype)(x))
        y = nn.relu(Conv(mid, 3, dtype=self.dtype)(y))
        y = Conv(self.ch, 1, dtype=self.dtype)(y)
        return x + y


class ChengNLAM(nn.Module):
    """Cheng CVPR2020 simplified attention: x + trunk(x) * sigmoid(conv(attn(x)))
    (ref: src/models/layer/cheng_nlam.py)."""
    ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        trunk = x
        for _ in range(3):
            trunk = NLAMResBlock(self.ch, dtype=self.dtype)(trunk)
        attn = x
        for _ in range(3):
            attn = NLAMResBlock(self.ch, dtype=self.dtype)(attn)
        attn = Conv(self.ch, 1, dtype=self.dtype)(attn)
        gate = nn.sigmoid(attn)
        return x + trunk * gate


def fourier_encode_beta(beta: jnp.ndarray, L: int, max_beta: float,
                        use_pi: bool = False, include_x: bool = True) -> jnp.ndarray:
    """Fourier features of a conditioning scalar (ref: src/models/layer/fourier_enc.py).

    beta: [B] in [0, max_beta]. Returns [B, 2L(+1)]:
    normalized to [-1,1], sin/cos at frequencies 2^0..2^(L-1) (optionally *pi),
    raw normalized value prepended when include_x.
    """
    beta = jnp.asarray(beta, jnp.float32).reshape(-1)
    nb = (beta / max_beta - 0.5) * 2.0  # [-1, 1]
    freq = 2.0 ** jnp.arange(L, dtype=jnp.float32)
    if use_pi:
        freq = freq * jnp.pi
    ang = nb[:, None] * freq[None, :]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if include_x:
        out = jnp.concatenate([nb[:, None], out], axis=-1)
    return jax.lax.stop_gradient(out)


class DualBetaCondMLP(nn.Module):
    """Shared conditioning trunk: Fourier(beta1) ++ Fourier(beta2) -> 2-layer MLP.

    Returns the cond vector [B, cond_ch] consumed by per-layer FiLM modules.
    """
    cond_ch: int
    L: int = 10
    max_beta_1: float = 3.0
    max_beta_2: float = 3.5
    use_pi: bool = False
    include_x: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, beta_1, beta_2):
        e1 = fourier_encode_beta(beta_1, self.L, self.max_beta_1,
                                 self.use_pi, self.include_x)
        e2 = fourier_encode_beta(beta_2, self.L, self.max_beta_2,
                                 self.use_pi, self.include_x)
        cond = jnp.concatenate([e1, e2], axis=-1)
        cond = nn.Dense(self.cond_ch, dtype=self.dtype)(cond)
        cond = nn.relu(cond)
        cond = nn.Dense(self.cond_ch, dtype=self.dtype)(cond)
        return cond


class BetaScaleShift(nn.Module):
    """FiLM: feat * (1 + scale(cond)) + shift(cond), cond broadcast over H,W
    (ref: elic_dual_beta_ft_autoencoder.py BetaScaleShiftModule; the reference's
    1x1 convs on a [1,C,1,1] map are Dense layers here)."""
    feat_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat, cond):
        # cond: [B, cond_ch] (or [1, cond_ch] broadcast over batch)
        h = nn.relu(nn.Dense(cond.shape[-1], dtype=self.dtype)(cond))
        scale = nn.Dense(self.feat_ch, dtype=self.dtype)(h)
        shift = nn.Dense(self.feat_ch, dtype=self.dtype)(h)
        scale = scale[:, None, None, :]
        shift = shift[:, None, None, :]
        return feat * (1.0 + scale) + shift


class GNResBlock(nn.Module):
    """Pre-activation GroupNorm residual block (femasr/codeformer style,
    ref: src/models/layer/codeformer_layers.py ResBlock with norm1/norm2).

    act: 'swish' (codeformer) or 'leakyrelu'/'silu' (femasr).
    """
    out_ch: int
    act: str = "swish"
    dtype: Optional[Dtype] = None

    def _act(self, x):
        if self.act == "swish" or self.act == "silu":
            return nn.silu(x)
        if self.act == "leakyrelu":
            return nn.leaky_relu(x, 0.2)
        if self.act == "gelu":
            return nn.gelu(x)
        if self.act == "relu":
            return nn.relu(x)
        raise ValueError(self.act)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm(num_groups=num_groups32(in_ch), epsilon=1e-6, dtype=self.dtype)(x)
        h = self._act(h)
        h = Conv(self.out_ch, 3, dtype=self.dtype)(h)
        h = GroupNorm(num_groups=num_groups32(self.out_ch), epsilon=1e-6, dtype=self.dtype)(h)
        h = self._act(h)
        h = Conv(self.out_ch, 3, dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = Conv(self.out_ch, 1, dtype=self.dtype)(x)
        return x + h


class FuseSftBlock(nn.Module):
    """SFT fusion: residual = w * (dec * scale(f) + shift(f)) with
    f = GNResBlock(concat(cond, dec)) (ref: codeformer_layers.py FuseSftBlock)."""
    dec_ch: int
    mid_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, dec_feat, cond_feat, w: float = 1.0):
        fuse = GNResBlock(self.mid_ch, act="swish", dtype=self.dtype)(
            jnp.concatenate([cond_feat, dec_feat], axis=-1)
        )
        scale = Conv(self.dec_ch, 3, dtype=self.dtype)(fuse)
        scale = nn.leaky_relu(scale, 0.2)
        scale = Conv(self.dec_ch, 3, dtype=self.dtype)(scale)
        shift = Conv(self.dec_ch, 3, dtype=self.dtype)(fuse)
        shift = nn.leaky_relu(shift, 0.2)
        shift = Conv(self.dec_ch, 3, dtype=self.dtype)(shift)
        return dec_feat + w * (dec_feat * scale + shift)


class LightFuseSftBlock(nn.Module):
    """Lighter SFT fusion: 1x1+3x3 fuse trunk instead of a GN ResBlock
    (ref: src/models/layer/light_fuse_layer.py)."""
    dec_ch: int
    mid_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, dec_feat, cond_feat, w: float = 1.0):
        fuse = Conv(self.mid_ch, 1, dtype=self.dtype)(
            jnp.concatenate([cond_feat, dec_feat], axis=-1))
        fuse = nn.leaky_relu(fuse, 0.2)
        fuse = Conv(self.mid_ch, 3, dtype=self.dtype)(fuse)
        fuse = nn.leaky_relu(fuse, 0.2)
        scale = Conv(self.dec_ch, 3, dtype=self.dtype)(fuse)
        shift = Conv(self.dec_ch, 3, dtype=self.dtype)(fuse)
        return dec_feat + w * (dec_feat * scale + shift)


class GDN(nn.Module):
    """Generalized divisive normalization (plain JAX; the reference uses the
    CUDA-backed compressai.layers.GDN in the non-default Balle18/Cheng20
    variants, ref: src/models/subnet/autoencoder/balle18_autoencoder.py:5).

    y_i = x_i / sqrt(beta_i + sum_j gamma_ij * x_j^2)   (inverse: multiply)
    Parameters are stored through a sqrt reparameterization with a pedestal so
    they remain positive under unconstrained optimization.
    """
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        pedestal = 2.0 ** -18
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = pedestal ** 0.5

        beta_raw = self.param(
            "beta_raw", lambda k: jnp.sqrt(jnp.ones(C) + pedestal))
        gamma_raw = self.param(
            "gamma_raw",
            lambda k: jnp.sqrt(self.gamma_init * jnp.eye(C) + pedestal))

        beta = jnp.square(jnp.maximum(beta_raw, beta_bound)) - pedestal
        gamma = jnp.square(jnp.maximum(gamma_raw, gamma_bound)) - pedestal

        norm = jnp.einsum("bhwj,ji->bhwi", jnp.square(x), gamma) + beta
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm
