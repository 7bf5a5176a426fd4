"""Conformer encoder (secondary encoder family of the reference).

Parity targets: fairseq ConformerWav2Vec2EncoderLayer (built at reference
modules/module.py:132-143,388-401) and ConformerEncoder (modules/module.py:
386-469) with espnet-style relative-position attention ('rel_pos'), rotary
('rope'), or absolute ('abs', used when layer_type=conformer inside the
plain TransformerEncoder).

Structure per layer: 0.5*FFN -> MHA(+rel pos) -> depthwise conv module ->
0.5*FFN -> LayerNorm, macaron style. BatchNorm inside the conv module uses
flax's batch_stats collection.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.config import StudentConfig
from fithubert_tpu.ops.attention import AttentionTaps
from fithubert_tpu.ops.pallas.dropout import module_prob_dropout
from fithubert_tpu.ops.conv import Conv1D
from fithubert_tpu.ops.norms import FP32LayerNorm
from fithubert_tpu.ops.padding import apply_padding_mask


def rel_positional_encoding(t: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """espnet RelPositionalEncoding table: positions T-1 .. -(T-1), shape (2T-1, d)."""
    pos = jnp.arange(t - 1, -t, -1.0)[:, None]  # (2T-1, 1)
    div = jnp.exp(jnp.arange(0, d, 2) * (-math.log(10000.0) / d))[None, :]
    pe = jnp.zeros((2 * t - 1, d))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """espnet rel_shift: (B, H, T, 2T-1) -> (B, H, T, T) aligning relative indices."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :].reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


class RelPositionAttention(nn.Module):
    """Transformer-XL style relative-position MHA (espnet semantics)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    quantize: bool = False  # int8 projection matmuls (ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pos_emb, key_padding_mask=None, deterministic=True,
                 need_taps=False):
        from fithubert_tpu.ops.quant import dense_cls

        b, t, c = x.shape
        h = self.num_heads
        dk = self.embed_dim // h
        dtype = self.dtype or x.dtype
        dense = lambda name: dense_cls(self.quantize)(
            self.embed_dim, dtype=dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(x).reshape(b, t, h, dk)
        k = dense("k_proj")(x).reshape(b, t, h, dk)
        v = dense("v_proj")(x).reshape(b, t, h, dk)
        # espnet RelPositionMultiHeadedAttention.linear_pos is bias-free
        p = dense_cls(self.quantize)(
            self.embed_dim, dtype=dtype, param_dtype=jnp.float32,
            use_bias=False, name="linear_pos",
        )(pos_emb).reshape(1, -1, h, dk)  # (1, 2T-1, H, dk)

        pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        q_u = q + pos_bias_u[None, None]
        q_v = q + pos_bias_v[None, None]
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k, preferred_element_type=jnp.float32)
        bd = jnp.einsum("bqhd,zkhd->bhqk", q_v, p, preferred_element_type=jnp.float32)
        bd = _rel_shift(bd)
        logits = (ac + bd).astype(jnp.float32) / math.sqrt(dk)
        if key_padding_mask is not None:
            # -inf only when the taps need true fairseq logits (the attn loss
            # scrubs them); otherwise a FINITE value so a FULLY padded row
            # (fabricated by pad_batch_to_full) softmaxes to uniform instead
            # of NaN-poisoning the loss — same guard as ops/attention.py
            neg = -jnp.inf if need_taps else jnp.float32(-1e30)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        if need_taps:
            probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        # (B,H,T,T) prob dropout via the mask-regenerating pallas kernel
        probs = module_prob_dropout(self, probs, self.dropout, deterministic)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(b, t, c)
        out = dense("out_proj")(out)
        if need_taps:
            v32 = v.transpose(0, 2, 1, 3).reshape(b * h, t, dk).astype(jnp.float32)
            v_rel = jnp.einsum("zqd,zkd->zqk", v32 / math.sqrt(dk), v32)
            taps = AttentionTaps(logits.reshape(b * h, t, t), v_rel)
        else:
            taps = AttentionTaps(None, None)
        return out, taps


def apply_rotary(x: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding on (B, T, H, D) with D even (fairseq
    ESPnetRotaryPositionalEmbedding semantics: rotate half-dims by position)."""
    b, t, h, d = x.shape
    half = d // 2
    freqs = jnp.arange(0, half, dtype=jnp.float32)
    inv = base ** (-freqs / half)
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]  # (T, half)
    cos = jnp.cos(ang)[None, :, None, :].astype(x.dtype)
    sin = jnp.sin(ang)[None, :, None, :].astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


class RotaryAttention(nn.Module):
    """MHA with rotary q/k (conformer pos_enc_type='rope',
    built at reference modules/module.py:404-409 via fairseq).

    Fairseq quirk reproduced exactly: RotaryPositionMultiHeadedAttention
    rotates the PRE-projection input viewed per-head — query/key are reshaped
    to (T, B, H, dk), rotated, flattened back, and only THEN passed through
    linear_q / linear_k; value is taken from the unrotated input."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    quantize: bool = False  # int8 projection matmuls (ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True,
                 need_taps=False):
        from fithubert_tpu.ops.quant import dense_cls

        b, t, c = x.shape
        h = self.num_heads
        dk = self.embed_dim // h
        dtype = self.dtype or x.dtype
        dense = lambda name: dense_cls(self.quantize)(
            self.embed_dim, dtype=dtype, param_dtype=jnp.float32, name=name
        )
        x_rot = apply_rotary(x.reshape(b, t, h, dk)).reshape(b, t, c)
        q = dense("q_proj")(x_rot).reshape(b, t, h, dk)
        k = dense("k_proj")(x_rot).reshape(b, t, h, dk)
        v = dense("v_proj")(x).reshape(b, t, h, dk)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) / math.sqrt(dk)
        if key_padding_mask is not None:
            # finite mask unless taps need -inf: see RelPositionAttention
            neg = -jnp.inf if need_taps else jnp.float32(-1e30)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        if need_taps:
            probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        probs = module_prob_dropout(self, probs, self.dropout, deterministic)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(b, t, c)
        out = dense("out_proj")(out)
        if need_taps:
            v32 = v.transpose(0, 2, 1, 3).reshape(b * h, t, dk).astype(jnp.float32)
            v_rel = jnp.einsum("zqd,zkd->zqk", v32 / math.sqrt(dk), v32)
            taps = AttentionTaps(logits.reshape(b * h, t, t), v_rel)
        else:
            taps = AttentionTaps(None, None)
        return out, taps


class FeedForwardModule(nn.Module):
    embed_dim: int
    ffn_dim: int
    dropout: float
    quantize: bool = False  # int8 w_1/w_2 matmuls (ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        from fithubert_tpu.ops.quant import dense_cls

        fc = dense_cls(self.quantize)
        x = FP32LayerNorm(name="layer_norm")(x)
        x = fc(self.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32,
               name="w_1")(x)
        x = jax.nn.silu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = fc(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
               name="w_2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class RowMaskedBatchNorm(nn.Module):
    """BatchNorm over (B, T, C) whose batch statistics EXCLUDE fabricated
    all-padding rows (pad_batch_to_full): the reference's partial trailing
    buckets never contain such rows, so their conv responses must not shift
    the running stats. Real rows keep their padded positions in the stats,
    matching fairseq's unmasked ConvolutionModule BatchNorm. Param / stats
    names mirror nn.BatchNorm (scale/bias, batch_stats mean/var) so state
    trees and importers are unchanged."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, row_valid=None, use_running_average=True):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            if row_valid is None:
                w = jnp.ones(x.shape[:2], jnp.float32)
            else:
                w = jnp.broadcast_to(
                    row_valid.astype(jnp.float32)[:, None], x.shape[:2]
                )
            denom = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x32 * w[..., None], axis=(0, 1)) / denom
            var = jnp.sum(
                (x32 - mean) ** 2 * w[..., None], axis=(0, 1)
            ) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon
        ) * scale + bias
        return y.astype(x.dtype)


class ConvolutionModule(nn.Module):
    embed_dim: int
    depthwise_kernel_size: int
    dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True, row_valid=None):  # (B, T, C)
        assert (self.depthwise_kernel_size - 1) % 2 == 0
        # all three convs are bias-free, matching fairseq ConvolutionModule's
        # bias=False default (the layer never overrides it)
        x = FP32LayerNorm(name="layer_norm")(x)
        x = Conv1D(2 * self.embed_dim, kernel_size=1, use_bias=False,
                   dtype=self.dtype, name="pointwise_conv1")(x)
        x = jax.nn.glu(x, axis=-1)
        pad = (self.depthwise_kernel_size - 1) // 2
        x = Conv1D(
            self.embed_dim, kernel_size=self.depthwise_kernel_size,
            groups=self.embed_dim, padding=(pad, pad), use_bias=False,
            dtype=self.dtype, name="depthwise_conv",
        )(x)
        x = RowMaskedBatchNorm(name="batch_norm")(
            x, row_valid=row_valid, use_running_average=deterministic
        )
        x = jax.nn.silu(x)
        x = Conv1D(self.embed_dim, kernel_size=1, use_bias=False,
                   dtype=self.dtype, name="pointwise_conv2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConformerEncoderLayer(nn.Module):
    """Macaron conformer block; returns (x, taps, layer_result) with
    layer_result = ffn2 output pre-residual (reference utils/utils.py:359-361).

    Attention dispatch mirrors fairseq ConformerEncoderLayer exactly: the
    espnet rel_pos / rope attentions are built ONLY when attn_type ==
    'espnet'; any other attn_type (incl. the config default '') falls back
    to the standard fairseq MultiheadAttention, with pos_emb unused."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float
    depthwise_conv_kernel_size: int = 31
    pos_enc_type: str = "abs"
    attn_type: str = "espnet"
    quantize: bool = False  # int8 attention/FFN matmuls (ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, padding_mask=None, pos_emb=None, deterministic=True,
                 need_taps=False):
        residual = x
        x = FeedForwardModule(self.embed_dim, self.ffn_dim, self.dropout,
                              self.quantize, self.dtype, name="ffn1")(
            x, deterministic)
        x = x * 0.5 + residual

        residual = x
        x = FP32LayerNorm(name="self_attn_layer_norm")(x)
        if self.attn_type != "espnet":
            from fithubert_tpu.ops.attention import MultiHeadSelfAttention

            x, taps = MultiHeadSelfAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout, quantize=self.quantize,
                dtype=self.dtype, name="self_attn",
            )(x, padding_mask, deterministic, need_taps)
        elif self.pos_enc_type == "rel_pos":
            x, taps = RelPositionAttention(
                self.embed_dim, self.num_heads, self.dropout, self.quantize,
                self.dtype, name="self_attn",
            )(x, pos_emb, padding_mask, deterministic, need_taps)
        elif self.pos_enc_type == "rope":
            x, taps = RotaryAttention(
                self.embed_dim, self.num_heads, self.dropout, self.quantize,
                self.dtype, name="self_attn",
            )(x, padding_mask, deterministic, need_taps)
        else:
            # espnet 'abs' (ESPNETMultiHeadedAttention) is plain scaled-dot
            # attention — math-identical to our standard MHA
            from fithubert_tpu.ops.attention import MultiHeadSelfAttention

            x, taps = MultiHeadSelfAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout, quantize=self.quantize,
                dtype=self.dtype, name="self_attn",
            )(x, padding_mask, deterministic, need_taps)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x + residual

        residual = x
        row_valid = (
            jnp.logical_not(jnp.all(padding_mask, axis=-1))
            if padding_mask is not None
            else None
        )
        x = ConvolutionModule(
            self.embed_dim, self.depthwise_conv_kernel_size, self.dropout,
            self.dtype, name="conv_module",
        )(x, deterministic, row_valid=row_valid)
        x = residual + x

        residual = x
        x = FeedForwardModule(self.embed_dim, self.ffn_dim, self.dropout,
                              self.quantize, self.dtype, name="ffn2")(
            x, deterministic)
        layer_result = x
        x = x * 0.5 + residual
        x = FP32LayerNorm(name="final_layer_norm")(x)
        return x, taps, layer_result


class ConformerEncoder(nn.Module):
    """Conformer stack with rel_pos/rope: no TR layer, no pad_to_multiple
    (reference modules/module.py:429-469)."""

    cfg: StudentConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic=True, need_taps=False,
                 tgt_slot: Optional[int] = None):
        """tgt_slot: stop after layer index N — the reference's tgt_layer
        early exit (modules/module.py:456-461); no TR module here so slot
        indexing equals layer indexing."""
        from fithubert_tpu.ops.transformer import EncoderOutput

        cfg = self.cfg
        if padding_mask is not None:
            x = apply_padding_mask(x, padding_mask)

        pos_emb = None
        if cfg.pos_enc_type == "rel_pos":
            pos_emb = rel_positional_encoding(
                x.shape[1], cfg.encoder_embed_dim, dtype=x.dtype
            )

        if not cfg.layer_norm_first:
            x = FP32LayerNorm(name="layer_norm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        layer_results = []
        layer_cls = ConformerEncoderLayer
        if cfg.checkpoint_activations:
            # rematerialize in backward, same flag handling as
            # TransformerEncoder (reference wraps layers in fairseq
            # checkpoint_wrapper, modules/module.py:144-145)
            layer_cls = nn.remat(layer_cls, static_argnums=(4, 5))
        for i in range(cfg.encoder_layers):
            y, taps, layer_result = layer_cls(
                embed_dim=cfg.encoder_embed_dim,
                ffn_dim=cfg.encoder_ffn_embed_dim,
                num_heads=cfg.encoder_attention_heads,
                dropout=cfg.dropout,
                depthwise_conv_kernel_size=cfg.depthwise_conv_kernel_size,
                pos_enc_type=cfg.pos_enc_type,
                attn_type=cfg.attn_type,
                quantize=cfg.quantize_matmuls,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, padding_mask, pos_emb, deterministic, need_taps)
            if cfg.encoder_layerdrop > 0 and not deterministic:
                # jit-safe stochastic identity gate, like TransformerEncoder
                keep = (
                    jax.random.uniform(self.make_rng("layerdrop"), ())
                    > cfg.encoder_layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y
            layer_results.append((x, taps, layer_result))
            if tgt_slot is not None and i >= tgt_slot:
                break

        return EncoderOutput(
            x=x, layer_results=layer_results, tr_layer_results=[],
            padding_mask=padding_mask,
        )
