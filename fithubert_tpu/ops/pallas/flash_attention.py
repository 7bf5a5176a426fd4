"""Fused flash-attention kernel for TPU (Pallas), with an XLA fallback.

The student/teacher hot loop is full bidirectional self-attention over padded
buckets (reference modules/module.py:498-504 uses fairseq MultiheadAttention,
O(T²) materialized). This kernel streams K/V blocks through VMEM with the
standard online-softmax recurrence, so the T×T matrix never hits HBM.

Contract: q is PRE-SCALED by the caller (fairseq semantics apply head_dim**-0.5
to q before QK^T); `key_padding_mask` is (B, T) with True = padding.
Shapes: q, k, v are (B, T, H, D). Returns (B, T, H, D) in q.dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_reference(q, k, v, key_padding_mask):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid: (BH, num_q_blocks, num_k_blocks) — k innermost for accumulation.

    Block shapes: q (1, bq, D), k/v (1, bk, D), mask (1, bk), out (1, bq, D).
    Scratch: m/l (bq, 128) running max / normalizer, acc (bq, D) fp32.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    mask = mask_ref[0]  # (bk,) True = pad
    s = jnp.where(mask[None, :], NEG_INF, s)

    m_prev = m_ref[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == nk - 1)
    def _finalize():
        # guard against fully-masked rows (all keys padded): l == 0
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention entry point. Falls back to the XLA path off-TPU or for
    shapes the kernel does not support (tiny T, unaligned head_dim)."""
    b, t, h, d = q.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    if (not on_tpu and not interpret) or t < 128:
        return _attention_reference(q, k, v, key_padding_mask)

    block_q = min(block_q, t)
    block_k = min(block_k, t)
    if t % block_q or t % block_k:
        return _attention_reference(q, k, v, key_padding_mask)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, d).astype(jnp.float32)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, t, d).astype(jnp.float32)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, t, d).astype(jnp.float32)
    if key_padding_mask is None:
        mask = jnp.zeros((b, t), dtype=bool)
    else:
        mask = key_padding_mask
    maskf = jnp.broadcast_to(mask[:, None, :], (b, h, t)).reshape(b * h, t)

    grid = (b * h, t // block_q, t // block_k)
    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_k), lambda z, i, j: (z, j)),
            pl.BlockSpec((1, block_q, d), lambda z, i, j: (z, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda z, i, j: (z, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda z, i, j: (z, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda z, i, j: (z, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(maskf, qf, kf, vf)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)
