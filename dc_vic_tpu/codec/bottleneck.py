"""Fully-factorized entropy bottleneck (Balle 2018 univariate density model).

Equivalent of compressai.entropy_models.EntropyBottleneck + the STE wrapper
(ref: src/models/subnet/entropy_model/entropy_bottleneck.py). The learned
per-channel cumulative is a chain of 1-wide MLP layers with softplus-positive
matrices and tanh gating; quantiles are the aux-optimized parameters whose
middle column is the coding median.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.cdf import build_cdf_rows
from ..ops.rans import CdfTable
from .ops import lower_bound, ste_round


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        K = len(self.filters) + 1
        sizes = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / K)
        C = self.channels

        matrices, biases, factors = [], [], []
        for i in range(K):
            init_m = math.log(math.expm1(1.0 / scale / sizes[i + 1]))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape=(C, sizes[i + 1], sizes[i]), v=init_m:
                    jnp.full(shape, v, jnp.float32),
            ))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape=(C, sizes[i + 1], 1):
                    jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5),
            ))
            if i < K - 1:
                factors.append(self.param(
                    f"factor_{i}",
                    lambda key, shape=(C, sizes[i + 1], 1): jnp.zeros(shape),
                ))
        self.matrices, self.biases, self.factors = matrices, biases, factors

        self.quantiles = self.param(
            "quantiles",
            lambda key: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]], jnp.float32),
                (C, 1, 1)).reshape(C, 1, 3),
        )

    # ----------------------------------------------------------------------
    def _logits_cumulative(self, inputs: jnp.ndarray, stop_gradient: bool) -> jnp.ndarray:
        """inputs: [C, 1, N] -> logits of the cumulative at each input."""
        sg = jax.lax.stop_gradient if stop_gradient else (lambda v: v)
        logits = inputs
        K = len(self.matrices)
        for i in range(K):
            m = jax.nn.softplus(sg(self.matrices[i]))
            logits = jnp.matmul(m, logits)
            logits = logits + sg(self.biases[i])
            if i < K - 1:
                logits = logits + jnp.tanh(sg(self.factors[i])) * jnp.tanh(logits)
        return logits

    def _likelihood(self, values: jnp.ndarray) -> jnp.ndarray:
        """values: [C, 1, N]."""
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def medians(self) -> jnp.ndarray:
        return self.quantiles[:, 0, 1]

    # ----------------------------------------------------------------------
    def __call__(self, x: jnp.ndarray, is_train: bool,
                 rng: Optional[jax.Array] = None, ste: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: NHWC. Returns (x_hat, likelihood) with channel-factorized coding.

        Training: additive-noise likelihood; x_hat is STE-rounded around the
        median (SteEntropyBottleneck) or the noisy value (ste=False).
        Eval: hard round around the median.
        """
        B, H, W, C = x.shape
        med = jax.lax.stop_gradient(self.medians()).reshape(1, 1, 1, C)
        v = x.transpose(3, 0, 1, 2).reshape(C, 1, -1)

        if is_train:
            assert rng is not None
            noisy = v + jax.random.uniform(rng, v.shape, v.dtype, -0.5, 0.5)
            lik = self._likelihood(noisy)
            x_hat = ste_round(x - med) + med if ste else _unperm(noisy, (B, H, W, C))
        else:
            med_v = med.reshape(C, 1, 1)
            q = jnp.round(v - med_v) + med_v
            lik = self._likelihood(q)
            x_hat = _unperm(q, (B, H, W, C))

        if self.likelihood_bound > 0:
            lik = lower_bound(lik, self.likelihood_bound)
        return x_hat, _unperm(lik, (B, H, W, C))

    def aux_loss(self) -> jnp.ndarray:
        """Quantile-fitting loss; gradients flow only to `quantiles`."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t], jnp.float32).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))

    # --- codec paths -----------------------------------------------------
    def quantize_symbols(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC -> int32 symbols (round around the per-channel median),
        clipped to the int16 transport range at the source so z_hat and the
        coded stream always agree (see GaussianConditional.SYM_CLIP)."""
        med = self.medians().reshape(1, 1, 1, -1)
        return jnp.clip(jnp.round(x - med), -32000, 32000).astype(jnp.int32)

    def dequantize(self, symbols: jnp.ndarray) -> jnp.ndarray:
        med = self.medians().reshape(1, 1, 1, -1)
        return symbols.astype(jnp.float32) + med


def bottleneck_indexes(shape_nhwc: Tuple[int, ...]) -> np.ndarray:
    """CDF row per element = its channel id (factorized model)."""
    B, H, W, C = shape_nhwc
    return np.broadcast_to(np.arange(C, dtype=np.int32), (B, H, W, C))


def _np_logits_cumulative(params: dict, inputs: np.ndarray) -> np.ndarray:
    """Host float64 evaluation of the learned cumulative's logits
    ([C, 1, N] -> [C, 1, N]). Table construction MUST be platform-
    independent: the quantized CDFs define the bitstream, and evaluating
    the chain with jnp on the default backend gave (slightly) different
    pmfs on TPU vs CPU — different integer tables — so a TPU-encoded
    stream desynced on a CPU decoder (r5 cross-platform check, the real
    root cause). Plain numpy double precision is deterministic and
    identical everywhere. (The reference never hits this: compressai
    stores _quantized_cdf buffers in the checkpoint and decode loads
    them, base_model.py:88-104 — which converted real checkpoints do
    here too; this builder serves freshly-initialized models.)"""
    mats = sorted(k for k in params if k.startswith("matrix_"))
    logits = np.asarray(inputs, np.float64)
    K = len(mats)
    for i in range(K):
        m = np.logaddexp(0.0, np.asarray(params[f"matrix_{i}"], np.float64))
        logits = np.matmul(m, logits) + np.asarray(params[f"bias_{i}"],
                                                   np.float64)
        if i < K - 1:
            f = np.tanh(np.asarray(params[f"factor_{i}"], np.float64))
            logits = logits + f * np.tanh(logits)
    return logits


def _np_sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def build_bottleneck_cdf(bound_module: EntropyBottleneck, params) -> CdfTable:
    """Offline CDF table construction (EntropyBottleneck.update equivalent).
    Runs entirely in host float64 (see _np_logits_cumulative: the tables
    define the bitstream and must not depend on the accelerator)."""
    p = {k: np.asarray(v) for k, v in params["params"].items()}
    q = p["quantiles"]
    medians = q[:, 0, 1].astype(np.float64)
    minima = np.clip(np.ceil(medians - q[:, 0, 0]), 0, None).astype(np.int64)
    maxima = np.clip(np.ceil(q[:, 0, 2] - medians), 0, None).astype(np.int64)
    pmf_length = minima + maxima + 1
    max_length = int(pmf_length.max())
    pmf_start = medians - minima

    C = bound_module.channels
    samples = (np.arange(max_length)[None, :]
               + pmf_start[:, None]).reshape(C, 1, -1)

    lower = _np_logits_cumulative(p, samples - 0.5)
    upper = _np_logits_cumulative(p, samples + 0.5)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_np_sigmoid(sign * upper) - _np_sigmoid(sign * lower))
    pmf = pmf.reshape(C, -1)
    tail = _np_sigmoid(lower[:, 0, 0]) + _np_sigmoid(-upper[:, 0, -1])

    pmf = np.where(np.arange(max_length)[None, :] < pmf_length[:, None], pmf, 0.0)
    cdfs = build_cdf_rows(pmf, tail, pmf_length, max_length)
    return CdfTable(cdfs, pmf_length + 2, -minima)


def _unperm(v: jnp.ndarray, shape_bhwc) -> jnp.ndarray:
    B, H, W, C = shape_bhwc
    return v.reshape(C, B, H, W).transpose(1, 2, 3, 0)
