"""Small differentiable codec primitives (STE round, lower bound)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through round (ref: src/models/subnet/entropy_model/ste_round.py)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    """max(x, bound) with a one-sided gradient: the gradient passes through
    when x >= bound or when it would push x upward (compressai LowerBound
    semantics — keeps scales from sticking below the bound)."""
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)
