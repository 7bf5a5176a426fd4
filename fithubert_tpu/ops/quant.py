"""Dynamic int8 matmuls for the frozen teacher (and int8 inference serving).

The reference's only quantization artifact is the fairseq
`quantize_model_scalar` hook applied at teacher load time
(/root/reference/utils/utils.py:13-20,117 — a no-op at its default settings).
On TPU the equivalent lever is real: the v5e MXU runs s8xs8->s32 at 2x its
bf16 FLOP rate, and the teacher is frozen — no gradients ever flow through
it — so its matmuls can run int8 without touching training numerics beyond
the (opt-in, bounded) quantization error on the distillation targets.

Recipe (the standard AQT/LLM-serving one):
  - weights:     per-OUTPUT-CHANNEL symmetric int8, quantized on the fly from
    the bf16 leaf each step (one elementwise pass; the param tree, importers
    and checkpoints stay byte-identical — no surgery, no extra leaves);
  - activations: per-TOKEN symmetric int8 (amax over the feature dim);
  - matmul:      lax.dot_general(int8, int8, preferred_element_type=int32);
  - dequant:     y = i32 * (x_scale ⊗ w_scale), computed in fp32, cast to the
    module compute dtype. Both scale factors factor out of the contraction
    exactly, so the only error source is the int8 rounding itself.

Enabled by `teacher: quantize_int8: true` (config.py) for the teacher, or
`StudentConfig.quantize_matmuls` for int8 student inference/serving. Training
a student THROUGH quantized matmuls is rejected by Distiller: round() has a
zero gradient almost everywhere and would silently stop learning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# amax can be 0 for an all-zero row/channel (e.g. fabricated all-padding
# batch rows); the floor keeps the scale finite and the quantized value 0.
_SCALE_FLOOR = 1e-12


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(..., K) @ (K, N) with both operands dynamically quantized to int8.

    Returns fp32 (caller casts to its compute dtype). Quantization math runs
    in fp32 regardless of input dtypes: the scales must be computed with more
    precision than the int8 payload or the rounding step compounds bf16
    round-off on top of the 8-bit rounding.
    """
    x32 = x.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, _SCALE_FLOOR
    )  # (..., 1) per token
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(w32), axis=0) / 127.0, _SCALE_FLOOR
    )  # (N,) per output channel
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    w_q = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale


class QuantDense(nn.Dense):
    """Drop-in nn.Dense with the matmul run s8xs8->s32 on the MXU.

    Subclasses nn.Dense so every field (features, use_bias, dtype,
    param_dtype, kernel_init, bias_init) and — critically — the param tree
    ("kernel" (K, N), "bias" (N,)) match nn.Dense exactly: a teacher imported
    by export/fairseq_import.py applies unchanged under either module.
    """

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (inputs.shape[-1], self.features),
            self.param_dtype,
        )
        out_dtype = self.dtype or inputs.dtype
        y = int8_matmul(inputs, kernel).astype(out_dtype)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(out_dtype)
        return y


def dense_cls(quantize: bool):
    """The Dense constructor for a (possibly quantized) matmul call site."""
    return QuantDense if quantize else nn.Dense
