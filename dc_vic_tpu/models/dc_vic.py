"""Composite DC-VIC compression models (ref: src/models/comp_model/).

One flax module covers the reference's model family via flags:
  * use_beta:  dual (beta_rate, beta_vq) FiLM conditioning
               (HyperpriorDualCondVicModel vs HyperpriorVicModel)
  * use_charm: channel-autoregressive y entropy model
               (HyperpriorCharm* vs plain hyperprior)

The module exposes pure methods (invoked via .apply(..., method=...)) so the
codec drivers can jit exactly the sub-graphs they need: one fused graph for
encode-side (transforms + symbolization), per-slice graphs for the
autoregressive decode, one fused graph for reconstruction.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..codec.bottleneck import EntropyBottleneck
from ..codec.gaussian import GaussianConditional
from ..utils.registry import (
    DECODER_REGISTRY,
    ENCODER_REGISTRY,
    HYPERDECODER_REGISTRY,
    HYPERENCODER_REGISTRY,
    MODEL_REGISTRY,
)
from .subnets import DualBlockSwinVqEstimator, Minnen20CharmContextModel
from .vqgan import VQDecoder, VQModel

Dtype = Any

# Images larger than this are reconstructed via overlap-tiled decode
# (ref: hyperprior_vic_model.py:25 SPLIT_DECODE_RESOLUTION).
SPLIT_DECODE_RESOLUTION = 1024
STRIDE = 64  # reflect-pad multiple (ref: base_model.py:30)


def pad_image(x: jnp.ndarray, stride: int = STRIDE) -> jnp.ndarray:
    """Reflect-pad NHWC image up to a stride multiple (ref: base_model.py:165-172)."""
    H, W = x.shape[1], x.shape[2]
    pad_h = (-H) % stride
    pad_w = (-W) % stride
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")


def crop_image(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    return x[:, :H, :W, :]


def to_model_range(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 pixels -> [-1, 1] float32 on device; float input passes through.

    Same f32 op order as the reference's host-side ToTensor + Normalize(.5,.5)
    (src/dataset/data_transform.py): t = x/255, then (t - .5)/.5 — but run on
    device, so the host->device image transfer is uint8 (4x fewer bytes).
    """
    if x.dtype == jnp.uint8:
        t = x.astype(jnp.float32) / 255.0
        return (t - 0.5) / 0.5
    return x


def likelihood_to_bpp(likelihood: jnp.ndarray, num_pixel: int) -> jnp.ndarray:
    bits = -jnp.sum(jnp.log(likelihood)) / jnp.log(2.0)
    return bits / num_pixel


def likelihood_to_bpp_per_sample(likelihood: jnp.ndarray,
                                 pixels_per_image: int) -> jnp.ndarray:
    """Per-sample bpp [B] (needed for per-sample beta-weighted rate loss,
    ref: dual_cond_rate_distortion...py:100-108)."""
    bits = -jnp.sum(jnp.log(likelihood), axis=(1, 2, 3)) / jnp.log(2.0)
    return bits / pixels_per_image


class DCVICModel(nn.Module):
    """Dual-conditioned VQGAN-based image compression model."""
    # subnet configs (yaml `subnet:` subtrees minus the `type:` key)
    encoder_type: str = "ElicDualBetaFtVqScEncoder"
    encoder_cfg: Optional[Dict[str, Any]] = None
    decoder_type: str = "ElicDualBetaFtFeatFusionDecoder"
    decoder_cfg: Optional[Dict[str, Any]] = None
    hyperencoder_type: str = "Minnen20HyperEncoder"
    hyperencoder_cfg: Optional[Dict[str, Any]] = None
    hyperdecoder_type: str = "Minnen20HyperDecoder"
    hyperdecoder_cfg: Optional[Dict[str, Any]] = None
    context_cfg: Optional[Dict[str, Any]] = None
    vq_estimator_cfg: Optional[Dict[str, Any]] = None
    fuse_schedule: Optional[Dict[str, Dict[str, int]]] = None
    fuse_type: str = "sft"
    ddconfig: Optional[Dict[str, Any]] = None
    n_embed: int = 256
    embed_dim: int = 4
    bottleneck_y: int = 192
    bottleneck_z: int = 192
    scale_bound: float = 0.11
    enc_vq_input: str = "onehot_indices"
    # feed the VQGAN reconstruction alongside the image into the encoder
    # (ref: hyperprior_vic_model.py enc_input_vq_recon)
    enc_input_vq_recon: bool = False
    # operate in [0,1] instead of [-1,1] for CompressAI-style training
    # (ref: base_model.py convert_img_range_to_01)
    convert_img_range_to_01: bool = False
    use_charm: bool = True
    use_beta: bool = True
    gumbel_sampling: bool = False
    gumbel_tau: float = 1.0
    dtype: Optional[Dtype] = None
    # Inference-time compute dtype for the FLOP-heavy conv stacks whose
    # outputs never need bit-reproducibility across graphs (VQGAN encode,
    # ELIC analysis AND synthesis transforms, hyper-ENcoder, Swin VQ
    # estimator, fused VQGAN decode — the synthesis side consumes the
    # already-decoded y_hat, so it can only affect pixels, not streams).
    # The entropy-critical modules (hyperdecoder, ChARM context) stay in
    # self.dtype: their mu/sigma must match bit-exactly between the encode
    # and decode graphs or the stream corrupts. "bfloat16" is the TPU
    # deployment mode; None keeps everything in f32.
    codec_dtype: Optional[str] = None
    # MXU pass count for the entropy-parameter convs (hyperdecoder, ChARM
    # slice transforms): "high" = faithful-f32 3-pass decomposition (the
    # default; required for compressai/CPU-parity streams), "default" =
    # single-pass bf16 multiplies — the fast TPU deployment mode. Safe for
    # the tpu stream format because encoder and decoder derive mu/sigma
    # from the SAME lowered executables (codec/driver.py shared-executable
    # design), so streams stay self-consistent; both sides must be built
    # with the same setting (it is part of the model config, like the
    # architecture itself).
    entropy_precision: Optional[str] = "high"

    def setup(self):
        cd = jnp.bfloat16 if self.codec_dtype == "bfloat16" else self.dtype
        enc_cfg = dict(self.encoder_cfg or {})
        dec_cfg = dict(self.decoder_cfg or {})
        self.encoder = ENCODER_REGISTRY.get(self.encoder_type)(
            dtype=cd, name="encoder", **enc_cfg)
        self.decoder = DECODER_REGISTRY.get(self.decoder_type)(
            dtype=cd, name="decoder", **dec_cfg)
        self.hyperencoder = HYPERENCODER_REGISTRY.get(self.hyperencoder_type)(
            dtype=cd, name="hyperencoder",
            **dict(self.hyperencoder_cfg or {}))
        self.hyperdecoder = HYPERDECODER_REGISTRY.get(self.hyperdecoder_type)(
            dtype=self.dtype, precision=self.entropy_precision,
            name="hyperdecoder", **dict(self.hyperdecoder_cfg or {}))

        self.entropy_z = EntropyBottleneck(self.bottleneck_z, name="entropy_z")
        self.gaussian = GaussianConditional(scale_bound=self.scale_bound)
        if self.use_charm:
            self.context_model = Minnen20CharmContextModel(
                bottleneck_y=self.bottleneck_y, gaussian=self.gaussian,
                dtype=self.dtype, precision=self.entropy_precision,
                name="context_model", **dict(self.context_cfg or {}))

        self.vq_estimator = DualBlockSwinVqEstimator(
            n_embed=self.n_embed, embed_dim=self.embed_dim, dtype=cd,
            name="vq_estimator", **dict(self.vq_estimator_cfg or {}))

        # Frozen VQGAN prior: encoder/quantizer side...
        self.vq_model = VQModel(
            n_embed=self.n_embed, embed_dim=self.embed_dim,
            ddconfig=self.ddconfig,
            with_decoder=self.enc_input_vq_recon, dtype=cd,
            name="vq_model")
        # ...and the decoder with trainable SFT fusion taps. Its non-fusion
        # parameters are populated with (and frozen to) the same VQGAN
        # checkpoint weights; only 'fusion_*' subtrees train.
        dd = dict(self.ddconfig or {})
        self.fused_decoder = VQDecoder(
            ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 2, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", (32,))),
            resolution=dd.get("resolution", 256),
            z_channels=dd.get("z_channels", 4), out_ch=dd.get("out_ch", 3),
            fuse_schedule=self.fuse_schedule, fuse_type=self.fuse_type,
            dtype=cd, name="fused_decoder")

    # ------------------------------------------------------------------ VQ
    def vq_encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Frozen VQGAN encode + nearest-codeword quantize.
        Returns (gt_vq_latent [B,h8,w8,D], gt_vq_indices [B,h8,w8])."""
        h = jax.lax.optimization_barrier(
            self.vq_model.encode(x).astype(jnp.float32))
        z_q, _, idx = self.vq_model.quantize(h)
        return jax.lax.stop_gradient(z_q), jax.lax.stop_gradient(idx)

    def vq_encode_tile(self, x_tile: jnp.ndarray) -> jnp.ndarray:
        """Pre-quant VQGAN latent of one tile batch (split-encode path:
        tiles are stitched on the host, then quantized via vq_quantize).
        Accepts uint8 tiles (normalized on device)."""
        return self.vq_model.encode(to_model_range(x_tile)
                                    ).astype(jnp.float32)

    def vq_quantize(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z_q, _, idx = self.vq_model.quantize(h)
        return z_q, idx

    def vq_indices_to_latent(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.vq_model.quantize.lookup(indices)

    def _vq_feat(self, gt_vq_latent, gt_vq_indices):
        """Encoder-side VQ conditioning feature (ref: comp_encode,
        hyperprior_vic_model.py:248-290)."""
        if self.enc_vq_input == "onehot_indices":
            onehot = jax.nn.one_hot(gt_vq_indices, self.n_embed,
                                    dtype=gt_vq_latent.dtype)
            return jnp.concatenate([gt_vq_latent, onehot], axis=-1)
        if self.enc_vq_input == "norm_indices":
            norm = (gt_vq_indices.astype(gt_vq_latent.dtype)
                    / (self.n_embed - 1))[..., None]
            return jnp.concatenate([gt_vq_latent, norm], axis=-1)
        if self.enc_vq_input == "long_indices":
            # embedding-based encoders take the raw latent + int indices
            return gt_vq_latent
        raise NotImplementedError(self.enc_vq_input)

    # ------------------------------------------------------------- encode
    def comp_encode(self, x, gt_vq_latent, gt_vq_indices, beta_rate, beta_vq):
        y = self._comp_encode_raw(x, gt_vq_latent, gt_vq_indices,
                                  beta_rate, beta_vq)
        # Entropy estimation/coding runs in f32 whatever codec_dtype is.
        # The barrier pins the bf16->f32 boundary: without it XLA may
        # rematerialize the cast with excess precision in one consumer, so
        # round(y - mu) computed for the symbol plane and for y_hat can
        # disagree by +-1 at ties — silently corrupting the stream (seen on
        # TPU with codec_dtype=bfloat16 at 2048x1344).
        return jax.lax.optimization_barrier(y.astype(jnp.float32))

    def _comp_encode_raw(self, x, gt_vq_latent, gt_vq_indices,
                         beta_rate, beta_vq):
        if self.convert_img_range_to_01:
            x = (x + 1.0) / 2.0
        if self.enc_input_vq_recon:
            recon = jax.lax.stop_gradient(self.vq_model.decode(
                self.vq_indices_to_latent(gt_vq_indices),
                force_not_quantize=True))
            x = jnp.concatenate([x, recon], axis=-1)
        feat = self._vq_feat(gt_vq_latent, gt_vq_indices)
        feat = jax.lax.stop_gradient(feat)
        if self.enc_vq_input == "long_indices":
            # embedding-based encoders consume the int token map directly
            if self.use_beta:
                return self.encoder(x, feat, beta_rate, beta_vq,
                                    gt_vq_indices)
            return self.encoder(x, feat, gt_vq_indices)
        if self.use_beta:
            return self.encoder(x, feat, beta_rate, beta_vq)
        return self.encoder(x, feat)

    def estimate_entropy(self, y, is_train: bool,
                         rng: Optional[jax.Array] = None,
                         calc_q_likelihood: bool = True) -> Dict:
        rng_z = rng_y = None
        if rng is not None:
            rng_z, rng_y = jax.random.split(rng)
        z = jax.lax.optimization_barrier(
            self.hyperencoder(y).astype(jnp.float32))
        z_hat, z_lik = self.entropy_z(z, is_train=is_train, rng=rng_z)
        _, z_q_lik = self.entropy_z(jax.lax.stop_gradient(z), is_train=False)
        hyper_out = self.hyperdecoder(z_hat)

        if self.use_charm:
            y_hat, y_lik, y_q_lik = self.context_model(
                y, hyper_out, is_train=is_train, rng=rng_y,
                calc_q_likelihood=True)
        else:
            y_hat, y_lik = self.gaussian(y, hyper_out, is_train, rng_y)
            _, y_q_lik = self.gaussian(
                jax.lax.stop_gradient(y), jax.lax.stop_gradient(hyper_out),
                is_train=False)

        return dict(
            quantized_code=dict(y=y_hat, z=z_hat),
            latent_code=dict(y=y, z=z),
            likelihoods=dict(y=y_lik, z=z_lik),
            q_likelihoods=dict(y=y_q_lik, z=z_q_lik),
        )

    # ------------------------------------------------------------- decode
    def decode_from_y_hat(self, y_hat, beta_rate=None, beta_vq=None,
                          w: float = 1.0, rng: Optional[jax.Array] = None,
                          use_gumbel: bool = False):
        """y_hat -> reconstruction. Returns (fake_images, vq_latent_pred,
        vq_logits, vq_indices)."""
        if self.use_beta:
            feat, cond_feats = self.decoder.get_feats(y_hat, beta_rate, beta_vq)
        else:
            feat, cond_feats = self.decoder.get_feats(y_hat)
        pred_embed, logits = self.vq_estimator(feat)
        indices = jnp.argmax(logits, axis=-1)

        if use_gumbel and self.gumbel_sampling:
            assert rng is not None
            g = jax.random.gumbel(rng, logits.shape, logits.dtype)
            weights = jax.nn.softmax((logits + g) / self.gumbel_tau, axis=-1)
            vq_latent = jnp.einsum("bhwn,nd->bhwd", weights,
                                   self.vq_model.quantize.embedding)
        else:
            vq_latent = self.vq_indices_to_latent(indices)

        vq_latent = self.vq_model.post_quant_conv(vq_latent)
        fake = self.fused_decoder(vq_latent, cond_feats, w)
        fake = fake.astype(jnp.float32)
        if self.convert_img_range_to_01:
            fake = fake * 2.0 - 1.0  # back to the [-1,1] output contract
        return fake, pred_embed, logits, indices

    # ------------------------------------------------------------ forward
    def __call__(self, x, beta_rate=None, beta_vq=None, is_train: bool = True,
                 rng: Optional[jax.Array] = None,
                 fix_entropy_models: bool = False, w: float = 1.0) -> Dict:
        """Full training/eval forward (ref: hyperprior_dc_vic_model.py:208-274).

        x: NHWC in [-1, 1], already padded to a stride-64 multiple.
        """
        gt_vq_latent, gt_vq_indices = self.vq_encode(x)

        def enc_branch():
            y = self.comp_encode(x, gt_vq_latent, gt_vq_indices,
                                 beta_rate, beta_vq)
            rng_e = None if rng is None else jax.random.fold_in(rng, 1)
            return y, self.estimate_entropy(y, is_train=is_train, rng=rng_e)

        if fix_entropy_models:
            # GAN stages freeze encoder+entropy: no grads through this branch
            # (ref: dual_cond_gan trainer :126-131).
            y, entropy = jax.tree.map(jax.lax.stop_gradient, enc_branch())
        else:
            y, entropy = enc_branch()
        y_hat = entropy["quantized_code"]["y"]

        rng_g = None if rng is None else jax.random.fold_in(rng, 2)
        fake, pred_embed, logits, indices = self.decode_from_y_hat(
            y_hat, beta_rate, beta_vq, w=w, rng=rng_g,
            use_gumbel=is_train and self.gumbel_sampling)

        vq_acc = jnp.mean((indices == gt_vq_indices).astype(jnp.float32))
        num_pixel = x.shape[0] * x.shape[1] * x.shape[2]
        ppi = x.shape[1] * x.shape[2]
        bpp = (likelihood_to_bpp(entropy["likelihoods"]["y"], num_pixel)
               + likelihood_to_bpp(entropy["likelihoods"]["z"], num_pixel))
        qbpp = (likelihood_to_bpp(entropy["q_likelihoods"]["y"], num_pixel)
                + likelihood_to_bpp(entropy["q_likelihoods"]["z"], num_pixel))
        bpp_per_sample = (
            likelihood_to_bpp_per_sample(entropy["likelihoods"]["y"], ppi)
            + likelihood_to_bpp_per_sample(entropy["likelihoods"]["z"], ppi))

        return dict(
            fake_images=fake,
            bpp_per_sample=bpp_per_sample,
            out_vq_latent=pred_embed,
            gt_vq_latent=gt_vq_latent,
            out_vq_logits=logits,
            gt_vq_indices=gt_vq_indices,
            vq_accuracy=vq_acc,
            bpp=bpp,
            qbpp=qbpp,
            **entropy,
        )

    def extract_y_hat(self, x, beta_rate=None, beta_vq=None):
        """Encode-only y_hat (no reconstruction) — used when the
        discriminator conditions on y_hat for held-out real images
        (ref: hyperprior_dc_vic_model.py extract_y_hat)."""
        gt_vq_latent, gt_vq_indices = self.vq_encode(x)
        y = self.comp_encode(x, gt_vq_latent, gt_vq_indices,
                             beta_rate, beta_vq)
        entropy = self.estimate_entropy(y, is_train=False)
        return jax.lax.stop_gradient(entropy["quantized_code"]["y"])

    # --------------------------------------------------- codec-side graphs
    def encode_deterministic(self, x, beta_rate, beta_vq,
                             include_latents: bool = False) -> Dict:
        """Jittable encode: image -> compact symbol planes + scalar stats.

        Host-transfer budget is the lever on this hardware (d2h ~30 MB/s with
        a ~30 ms sync floor), so the graph emits int16 symbols, uint8 CDF
        indexes, and per-image scalar bit estimates — ~0.9 MB/image instead of
        ~12 MB. include_latents=True additionally returns y_hat/z_hat for
        round-trip verification (ref parity hook: scripts/compress.py:137-138).
        Accepts uint8 images (normalized on device — 4x smaller h2d).
        """
        x = to_model_range(x)
        gt_vq_latent, gt_vq_indices = self.vq_encode(x)
        return self.encode_deterministic_from_vq(
            x, gt_vq_latent, gt_vq_indices, beta_rate, beta_vq,
            include_latents=include_latents)

    def encode_deterministic_from_vq(self, x, gt_vq_latent, gt_vq_indices,
                                     beta_rate, beta_vq,
                                     include_latents: bool = False) -> Dict:
        """encode_deterministic with the VQ stage precomputed (used by the
        split-encode path for >1024px images, where the VQGAN encode runs as
        a separate tile-batched graph)."""
        x = to_model_range(x)
        y = self.comp_encode(x, gt_vq_latent, gt_vq_indices, beta_rate, beta_vq)
        z = jax.lax.optimization_barrier(
            self.hyperencoder(y).astype(jnp.float32))
        z_sym = self.entropy_z.quantize_symbols(z)
        z_hat = self.entropy_z.dequantize(z_sym)
        # Pinned: the decode graph recomputes hyper_out from the same z_hat
        # (hyper_decode) and the two must agree bitwise — the barrier keeps
        # the hyperdecoder an isolated subgraph in both executables.
        hyper_out = jax.lax.optimization_barrier(self.hyperdecoder(z_hat))

        if self.use_charm:
            y_sym, sigma, y_hat, y_lik = self.context_model.compress_forward(
                y, hyper_out)
        else:
            means, sigma = jnp.split(hyper_out, 2, axis=-1)
            y_sym = self.gaussian.quantize_symbols(y, means)
            y_hat = self.gaussian.dequantize(y_sym, means)
            _, y_lik = self.gaussian(y, hyper_out, is_train=False)

        _, z_lik = self.entropy_z(z, is_train=False)
        ln2 = jnp.log(2.0)
        y_idx = self.y_indexes(sigma)
        # Symbol and CDF index share one uint16 plane (sym in 10 bits biased,
        # idx in 6 bits: the scale table has 64 entries) — halves the symbol
        # d2h bytes. The host falls back to the separate planes (lazy, only
        # fetched then) when max_abs_sym >= 512 (pathological inputs).
        y_packed = ((y_idx.astype(jnp.uint16) << 10)
                    | (jnp.clip(y_sym, -512, 511) + 512).astype(jnp.uint16))
        z_i16 = jnp.clip(z_sym, -32000, 32000).astype(jnp.int16)
        B = y_packed.shape[0]
        y_bits = -jnp.sum(jnp.log(y_lik), axis=(1, 2, 3)) / ln2
        z_bits = -jnp.sum(jnp.log(z_lik), axis=(1, 2, 3)) / ln2
        max_abs_y = jnp.max(jnp.abs(y_hat))
        max_abs_sym = jnp.max(jnp.abs(y_sym))
        out = dict(
            z_symbols=z_i16,
            y_symbols=jnp.clip(y_sym, -32000, 32000).astype(jnp.int16),
            y_indexes=y_idx.astype(jnp.uint8),
            y_packed=y_packed,
            # Fused d2h buffers: ONE uint16 plane (y packed + z bitcast) and
            # ONE f32 stats vector per batch — each separate fetch over the
            # tunnel pays a ~30 ms sync floor, so small arrays are coalesced.
            sym_plane=jnp.concatenate(
                [y_packed.reshape(B, -1),
                 jax.lax.bitcast_convert_type(z_i16, jnp.uint16)
                    .reshape(B, -1)], axis=1),
            stats=jnp.concatenate(
                [y_bits, z_bits, max_abs_y[None], max_abs_sym[None]]),
            y_bits=y_bits,
            z_bits=z_bits,
            max_abs_y=max_abs_y,
            max_abs_sym=max_abs_sym,
        )
        if include_latents:
            out.update(y_hat=y_hat, z_hat=z_hat)
        return out

    def hyper_decode(self, z_symbols):
        """z symbols -> hyper_out (decode side, jittable)."""
        z_hat = self.entropy_z.dequantize(z_symbols.astype(jnp.int32))
        # Pinned to match the encode side bitwise (see encode_deterministic).
        return jax.lax.optimization_barrier(self.hyperdecoder(z_hat)), z_hat

    # ------------------------------------------- shared-executable pipeline
    # The rANS stream only stays synchronized if the decoder derives
    # BITWISE-identical entropy parameters (hyper_out, per-slice mu/sigma,
    # y_hat_prev) from the transmitted integers. Optimization barriers are
    # not sufficient: XLA lowers the same f32 subgraph differently in
    # differently-shaped executables (MXU tiling / bf16-multiply rounding
    # are lowering-dependent), and at Kodak batch-16 geometry the encode and
    # decode monoliths were observed to disagree on mu by bf16-ULP amounts —
    # desynchronizing the stream (round-3 regression; first instance of the
    # class in PERF.md §8). The codec driver therefore runs BOTH pipelines
    # through the SAME compiled executables for every float that must match:
    # hyper_decode, charm_slice_params, charm_decode_step (and
    # y_means_indexes / y_dequantize for non-ChARM models). Only integers
    # (z/y symbols, stream words) cross executable boundaries — those are
    # exact by construction. encode_front is the encoder-only stage that
    # stops at the integer z symbols.
    def encode_front(self, x, beta_rate, beta_vq):
        """Pipeline encode stage 1: image -> (y f32, z symbols int16).
        Everything downstream (hyper_out, mu/sigma, y_hat) is recomputed by
        the decoder and must come from shared executables — see above."""
        x = to_model_range(x)
        gt_vq_latent, gt_vq_indices = self.vq_encode(x)
        return self.encode_front_from_vq(x, gt_vq_latent, gt_vq_indices,
                                         beta_rate, beta_vq)

    def encode_front_from_vq(self, x, gt_vq_latent, gt_vq_indices,
                             beta_rate, beta_vq):
        """encode_front with the VQ stage precomputed (>1024px split path)."""
        x = to_model_range(x)
        y = self.comp_encode(x, gt_vq_latent, gt_vq_indices,
                             beta_rate, beta_vq)
        z = jax.lax.optimization_barrier(
            self.hyperencoder(y).astype(jnp.float32))
        z_sym = self.entropy_z.quantize_symbols(z)
        return y, jnp.clip(z_sym, -32000, 32000).astype(jnp.int16)

    def charm_symbolize(self, slice_ind: int, y, mu):
        """Encode-side slice symbolization: clip(round(y_i - mu)) as int16.
        Elementwise on (pinned f32 y, shared-executable mu) — deterministic
        across executables, so it may live in its own tiny jit."""
        sc = self.bottleneck_y // self.context_model.num_slices
        y_slice = y[..., slice_ind * sc:(slice_ind + 1) * sc]
        return self.gaussian.quantize_symbols(y_slice, mu).astype(jnp.int16)

    def y_means_indexes(self, hyper_out):
        """Non-ChARM: (means, cdf indexes) from hyper_out — the decode-side
        executable the encode pipeline shares (see pipeline note above)."""
        means, sigma = jnp.split(hyper_out, 2, axis=-1)
        return means, self.y_indexes(sigma).astype(jnp.uint8)

    def y_symbolize(self, y, means):
        return self.gaussian.quantize_symbols(y, means).astype(jnp.int16)

    def y_dequantize(self, symbols, means):
        return self.gaussian.dequantize(symbols.astype(jnp.int32), means)

    def charm_slice_params(self, slice_ind: int, hyper_out, y_hat_prev):
        """Decode-side: (mu, cdf indexes) for one slice."""
        mu, sigma = self.context_model.slice_params(
            slice_ind, hyper_out, y_hat_prev)
        return mu, self.y_indexes(sigma).astype(jnp.uint8)

    def charm_slice_reconstruct(self, slice_ind: int, hyper_out, y_hat_prev,
                                symbols, mu):
        return self.context_model.slice_reconstruct(
            slice_ind, hyper_out, y_hat_prev, symbols.astype(jnp.int32), mu)

    def charm_decode_step(self, slice_ind: int, hyper_out, y_hat_prev,
                          symbols, mu):
        """Fused decode step: reconstruct slice `slice_ind` from its decoded
        symbols AND predict (mu, indexes) for slice `slice_ind`+1 — one device
        round-trip per slice instead of two."""
        y_hat_slice = self.context_model.slice_reconstruct(
            slice_ind, hyper_out, y_hat_prev, symbols.astype(jnp.int32), mu)
        y_hat_prev = jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
        num_slices = self.context_model.num_slices
        if slice_ind + 1 >= num_slices:
            return y_hat_prev, None, None
        mu_next, sigma_next = self.context_model.slice_params(
            slice_ind + 1, hyper_out, y_hat_prev)
        return (y_hat_prev, mu_next,
                self.y_indexes(sigma_next).astype(jnp.uint8))

    def y_indexes(self, sigma):
        from ..codec.gaussian import get_scale_table
        return self.gaussian.build_indexes(sigma, get_scale_table())

    def reconstruct_uint8(self, y_hat, beta_rate=None, beta_vq=None,
                          w: float = 1.0):
        """y_hat -> uint8 image on device (saves 4x on the d2h transfer)."""
        fake, *_ = self.decode_from_y_hat(y_hat, beta_rate, beta_vq, w=w)
        fake = jnp.clip(fake, -1.0, 1.0)
        return jnp.round((fake + 1.0) * 127.5).astype(jnp.uint8)

    def aux_loss(self):
        return self.entropy_z.aux_loss()


@MODEL_REGISTRY.register("HyperpriorCharmDualCondVicModel")
def _charm_dual(**kw):
    return DCVICModel(use_charm=True, use_beta=True, **kw)


@MODEL_REGISTRY.register("HyperpriorDualCondVicModel")
def _dual(**kw):
    return DCVICModel(use_charm=False, use_beta=True, **kw)


@MODEL_REGISTRY.register("HyperpriorCharmVicModel")
def _charm(**kw):
    return DCVICModel(use_charm=True, use_beta=False, **kw)


@MODEL_REGISTRY.register("HyperpriorVicModel")
def _vic(**kw):
    return DCVICModel(use_charm=False, use_beta=False, **kw)
