"""Fused single-head attention (Pallas TPU kernel, flash-attention style).

The VQGAN's AttnBlock is full softmax attention over all spatial positions
(ref: ldm/modules/diffusionmodules/model.py:150-203). At 768x512 inputs the
latent has 6144 tokens, so the naive [N, N] score matrix costs ~150 MB of
HBM traffic per block per image. This kernel streams K/V blocks against each
Q block with online softmax, never materializing the score matrix.

Backward pass: custom VJP that recomputes attention with plain XLA einsums
(the kernel is inference-hot; training throughput is conv-dominated).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512   # query block
BK = 512   # key/value block


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid (B, Nq/BQ, Nk/BK); online-softmax accumulation over the k axis."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # [BQ, C]
    k = k_ref[0]                      # [BK, C]
    v = v_ref[0]                      # [BK, C]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    m_prev = m_ref[:]                 # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)            # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)   # [BQ, 1]

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    # cast the f32 probabilities to v's dtype for the PV product: with bf16
    # inputs both MXU passes run at full rate (f32 multiplies run at ~1/4);
    # accumulation stays f32 either way
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_attention_fwd_impl(q, k, v):
    """q, k, v: [B, N, C] (q pre-scaled). Returns [B, N, C]."""
    B, N, C = q.shape
    assert N % BQ == 0 and N % BK == 0, "caller guards divisibility"
    grid = (B, N // BQ, N // BK)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, C), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, C), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out


def _reference_attention(q, k, v):
    s = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmc->bnc", p, v)


@jax.custom_vjp
def flash_attention(q, k, v):
    """Single-head attention, q pre-scaled: softmax(q k^T) v.
    Uses the Pallas kernel when shapes allow, XLA einsums otherwise."""
    B, N, C = q.shape
    if (jax.default_backend() == "tpu" and N % BQ == 0 and N % BK == 0
            and C % 128 == 0):
        try:
            return _flash_attention_fwd_impl(q, k, v)
        except Exception:
            return _reference_attention(q, k, v)
    return _reference_attention(q, k, v)


def _fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    # Recompute-based gradients via plain XLA (training is conv-dominated).
    q, k, v = res
    s = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bnm,bnc->bmc", p, gf)
    dp = jnp.einsum("bnc,bmc->bnm", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmc->bnc", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bnm,bnc->bmc", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
