"""Categorical entropy model over VQ token indices (registered alternative,
unused by shipped configs; ref: src/models/subnet/entropy_model/__init__.py
VqCategoricalEntropyModel)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .ops import lower_bound


@dataclasses.dataclass(frozen=True)
class VqCategoricalEntropyModel:
    likelihood_bound: float = 1e-9

    def __call__(self, indices: jnp.ndarray, pred_logits: jnp.ndarray,
                 is_train: bool = True):
        """indices: [B, H, W] int tokens; pred_logits: [B, H, W, n_embed].
        Returns (indices, per-token likelihood [B, H, W, 1])."""
        p = jax.nn.softmax(pred_logits, axis=-1)
        lik = jnp.take_along_axis(p, indices[..., None], axis=-1)
        if self.likelihood_bound > 0:
            lik = lower_bound(lik, self.likelihood_bound)
        return indices, lik
