"""Multi-head self-attention with optional logit/value-relation taps.

The reference harvests pre-softmax attention logits and a value-relation
matrix through runtime monkey-patches (reference utils/utils.py:193-366 with
fairseq MultiheadAttention(before_softmax=True)). Here the taps are explicit,
config-gated return values so the O(T²) tensors are only materialized when a
loss actually consumes them — otherwise the kernel can run a fused
flash-attention path (ops/pallas/flash_attention.py).

Layout is (B, T, C); taps follow fairseq's (B*H, T, T) flattening so the loss
engine matches the reference bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionTaps(NamedTuple):
    attn_logits: Optional[jnp.ndarray]  # (B*H, T, T) fp32, -inf at padded keys
    v_rel: Optional[jnp.ndarray]  # (B*H, T, T) fp32: (v*scaling) @ v^T


# The reference encoder applies fairseq init_bert_params over every Linear /
# MultiheadAttention projection (reference modules/module.py:254): N(0, 0.02).
bert_init = nn.initializers.normal(stddev=0.02)


class MultiHeadSelfAttention(nn.Module):
    """fairseq-semantics MHA: q scaled by head_dim**-0.5 before QK^T,
    key-padding mask as -inf pre-softmax, fp32 softmax, dropout on probs.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    quantize: bool = False  # int8 qkvo matmuls (ops/quant.py; frozen/serving)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True = pad
        deterministic: bool = True,
        need_taps: bool = False,
    ):
        b, t, c = x.shape
        h = self.num_heads
        head_dim = self.embed_dim // h
        scaling = head_dim**-0.5
        dtype = self.dtype or x.dtype

        from fithubert_tpu.ops.quant import dense_cls

        dense = lambda name: dense_cls(self.quantize)(
            self.embed_dim,
            kernel_init=bert_init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        q = dense("q_proj")(x) * scaling
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        q = q.reshape(b, t, h, head_dim)
        k = k.reshape(b, t, h, head_dim)
        v = v.reshape(b, t, h, head_dim)

        # pallas handles training-time prob-dropout in-kernel (PRNG seeded per
        # block), so the gate only excludes the taps path; flash_attention's
        # own dispatch sends everything whose T x T logits fit HBM to XLA's
        # (faster) fused attention anyway
        use_pallas = self.use_pallas and not need_taps
        if use_pallas:
            from fithubert_tpu.ops.pallas.flash_attention import flash_attention

            dropout_p = 0.0 if deterministic else self.dropout
            seed = None
            if dropout_p > 0.0:
                # full 64 bits of seed material — a 31-bit seed space
                # collides across sites at ~n^2/2^31 per step (ADVICE r3)
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (2,), jnp.uint32),
                    jnp.int32,
                )
            out = flash_attention(
                q, k, v, key_padding_mask,
                dropout_p=dropout_p, dropout_seed=seed,
            )  # (B, T, H, hd), q pre-scaled
            taps = AttentionTaps(None, None)
        else:
            # In bf16 compute mode (and when the fp32 logit taps are not
            # needed) keep the materialized T x T logits in bf16: it halves
            # the HBM traffic of the attention fusions — the dominant cost at
            # FitHuBERT shapes — and is range-safe (bf16 shares fp32's
            # exponent). The reference under AMP computes these in fp16
            # anyway; fp32 logits are kept for fp32 mode and for the taps.
            logits_dtype = (
                jnp.float32 if (need_taps or dtype == jnp.float32) else dtype
            )
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=logits_dtype
            ).astype(logits_dtype)
            if key_padding_mask is not None:
                # taps keep true -inf (the reference's before_softmax logits
                # carry -inf, and its attn-MSE loss scrubs them); otherwise a
                # FINITE mask value so a FULLY padded row (batch rows
                # fabricated by pad_batch_to_full) softmaxes to uniform
                # instead of 0/0 = NaN poisoning the loss and every gradient
                neg = jnp.asarray(
                    -jnp.inf if need_taps else -1e30, dtype=logits.dtype
                )
                logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
            probs = jax.nn.softmax(logits, axis=-1)
            if need_taps:
                # with -inf taps a fully-padded row softmaxes to NaN; zero it
                # so the value path stays finite (the attn loss scrubs the
                # -inf logits itself, reference train.py:337-341)
                probs = jnp.where(jnp.isnan(probs), 0.0, probs)
            # mask-regenerating pallas dropout: the (B,H,T,T) prob tensor is
            # the one dropout site that costs more than the op it regularizes
            # (ops/pallas/dropout.py; differentiable bernoulli off-TPU)
            from fithubert_tpu.ops.pallas.dropout import module_prob_dropout

            probs = module_prob_dropout(self, probs, self.dropout, deterministic)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd",
                probs.astype(dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            if need_taps:
                v_flat = v.transpose(0, 2, 1, 3).reshape(b * h, t, head_dim)
                v32 = v_flat.astype(jnp.float32)
                v_rel = jnp.einsum(
                    "zqd,zkd->zqk", v32 * scaling, v32, preferred_element_type=jnp.float32
                )
                taps = AttentionTaps(logits.reshape(b * h, t, t), v_rel)
            else:
                taps = AttentionTaps(None, None)

        out = out.reshape(b, t, self.embed_dim)
        out = dense("out_proj")(out)
        return out, taps
