"""Conditional Gaussian entropy model (parameter-free, pure functions).

Equivalent of compressai.entropy_models.GaussianConditional plus the STE
wrapper the reference ships for y (ref: src/models/subnet/entropy_model/
ste_gaussian_conditional.py). Because it holds no trainable parameters it is
a plain dataclass of jittable pure functions, freely passable into the
channel-autoregressive context model — no module plumbing.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _scipy_norm

from ..ops.cdf import build_cdf_rows
from ..ops.rans import CdfTable
from .ops import lower_bound, ste_round

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(smin: float = SCALES_MIN, smax: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """64 log-spaced scales in [0.11, 256] (compressai default)."""
    return np.exp(np.linspace(math.log(smin), math.log(smax), levels))


def _standardized_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF via erfc for numerical stability in the tails."""
    return 0.5 * jax.lax.erfc(-x * (2 ** -0.5))


@dataclasses.dataclass(frozen=True)
class GaussianConditional:
    """Mean-scale Gaussian conditional with noise-based training likelihood
    and STE-rounded reconstruction (SteGaussianMeanScaleConditional)."""
    scale_bound: float = SCALES_MIN
    likelihood_bound: float = 1e-9
    tail_mass: float = 1e-9

    # --- differentiable paths -------------------------------------------------
    def likelihood(self, y, scales, means):
        scales = lower_bound(scales, self.scale_bound)
        values = jnp.abs(y - means)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        lik = upper - lower
        if self.likelihood_bound > 0:
            lik = lower_bound(lik, self.likelihood_bound)
        return lik

    def __call__(self, y, params, is_train: bool, rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """params: concat(mean, scale) on the channel axis. Returns
        (y_hat, likelihood). Training: additive-noise likelihood + STE-rounded
        y_hat around the mean; eval: hard round around the mean."""
        means, scales = jnp.split(params, 2, axis=-1)
        if is_train:
            assert rng is not None, "training likelihood needs a noise rng"
            noise = jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
            lik = self.likelihood(y + noise, scales, means)
            y_hat = ste_round(y - means) + means
        else:
            y_hat = jnp.round(y - means) + means
            lik = self.likelihood(y_hat, scales, means)
        return y_hat, lik

    # --- codec paths (deterministic, jittable) --------------------------------
    # Coded symbols are clipped to +-32000 AT QUANTIZATION so y_hat, the
    # int16 device->host planes, and the byte streams all see the same
    # value — an unclipped y_hat would silently diverge from the decoder on
    # pathological inputs (lossy only beyond 32000 quantization bins).
    SYM_CLIP = 32000

    def quantize_symbols(self, y, means):
        return jnp.clip(jnp.round(y - means), -self.SYM_CLIP,
                        self.SYM_CLIP).astype(jnp.int32)

    def dequantize(self, symbols, means):
        return symbols.astype(means.dtype) + means

    def build_indexes(self, scales, scale_table: np.ndarray) -> jnp.ndarray:
        """Index of the smallest table scale >= scale (after bounding).

        Computed as the count of table entries strictly below each scale
        (compressai semantics: reference build_indexes subtracts
        (scales <= s) per table entry), via a broadcast-compare + fused
        reduction. Do NOT use jnp.searchsorted here: on TPU it lowers to a
        binary search whose per-iteration table gathers serialize at ~9
        ns/element — ~42 ms per 786k-element ChARM slice, which dominated
        BOTH codec graphs (~250 ms of the decode's former 250 ms
        "composition gap" and a similar share of the encode graph; see
        scripts/decode_gap_probe.py round-3 log). The compare-reduce fuses
        to pure vector ops with no [..., T] materialization."""
        scales = jnp.maximum(scales, self.scale_bound)
        # Pin the compare operand: searchsorted forced `scales` to
        # materialize, and that materialization was load-bearing — a fused
        # compare lets XLA:TPU rematerialize the sigma producer chain with
        # excess precision DIFFERENTLY in the encode and decode graphs, so
        # indexes disagree at representation ties and the streams desync
        # (observed: 7/16 bench images under-consumed y words; same bug
        # class as PERF.md §8).
        scales = jax.lax.optimization_barrier(scales)
        table = jnp.asarray(scale_table[:-1], scales.dtype)
        return jnp.sum(scales[..., None] > table,
                       axis=-1).astype(jnp.int32)

    # --- offline table building ------------------------------------------------
    def build_cdf_table(self, scale_table: Optional[np.ndarray] = None) -> CdfTable:
        """Quantized CDF rows per table scale (GaussianConditional.update)."""
        scale_table = np.asarray(
            get_scale_table() if scale_table is None else scale_table, np.float64)
        multiplier = -_scipy_norm.ppf(self.tail_mass / 2)
        pmf_center = np.ceil(scale_table * multiplier).astype(np.int64)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        samples = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None])
        s = scale_table[:, None]
        upper = _np_std_cumulative((0.5 - samples) / s)
        lower = _np_std_cumulative((-0.5 - samples) / s)
        pmf = upper - lower
        tail_mass = 2.0 * lower[:, :1]

        # rows beyond pmf_length are zero-padded; build_cdf_rows slices per row
        pmf = np.where(np.arange(max_length)[None, :] < pmf_length[:, None], pmf, 0.0)
        cdfs = build_cdf_rows(pmf, tail_mass[:, 0], pmf_length, max_length)
        return CdfTable(cdfs, pmf_length + 2, -pmf_center)


def _np_std_cumulative(x: np.ndarray) -> np.ndarray:
    from scipy.special import erfc
    return 0.5 * erfc(-x / np.sqrt(2.0))
