"""Projection heads for distillation.

  SplitLinear       ≙ reference modules/module.py:585-619 (batched per-task
                      linear, einsum-based — maps directly onto one MXU matmul)
  LayerWiseProjHead ≙ reference modules/module.py:622-661 (per-layer
                      ConvTranspose upsample + Linear d->768)
  MelSpecHead       ≙ reference modules/module.py:664-701 (same-length conv
                      stack over mel features, ReLU between layers)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.ops.conv import Conv1D, ConvTranspose1D


class SplitLinear(nn.Module):
    """x (B, T, N*Din) -> (B, T, N*Dout): independent linear per task split."""

    in_dim: int
    in_split: int
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.in_split == 1:
            return nn.Dense(
                self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="layer"
            )(x)
        b, t, _ = x.shape
        bound = self.in_dim**-0.5
        uniform = nn.initializers.uniform(scale=2 * bound)

        def centered_uniform(key, shape, dtype=jnp.float32):
            return uniform(key, shape, dtype) - bound

        weight = self.param(
            "weight", centered_uniform, (self.in_split, self.in_dim, self.out_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", centered_uniform, (1, 1, self.in_split, self.out_dim), jnp.float32
        )
        dtype = self.dtype or x.dtype
        xs = x.reshape(b, t, self.in_split, self.in_dim)
        # jax's CPU thunk runtime cannot execute BATCHED bf16 x bf16 = f32
        # dots (n is a batch dim here); off-TPU compute the einsum in fp32
        in_dtype = (
            jnp.float32
            if jax.default_backend() == "cpu" and jnp.dtype(dtype) != jnp.float32
            else dtype
        )
        out = jnp.einsum(
            "btni,nio->btno", xs.astype(in_dtype), weight.astype(in_dtype),
            preferred_element_type=jnp.float32,
        )
        out = out + bias
        return out.reshape(b, t, self.in_split * self.out_dim).astype(dtype)


class _ConvTransposeParams(nn.Module):
    """Creates params identical to ConvTranspose1D (same names/shapes/init)
    but returns them instead of computing — used to batch the per-layer
    projection heads into one (L, ...) einsum while keeping the checkpoint
    param tree byte-identical to the per-head modules."""

    features: int
    kernel_size: int
    in_ch: int

    @nn.compact
    def __call__(self):
        bound = 1.0 / math.sqrt(self.in_ch * self.kernel_size)
        uniform = nn.initializers.uniform(scale=2 * bound)

        def shifted_uniform(key, shape, dtype=jnp.float32):
            return uniform(key, shape, dtype) - bound

        kernel = self.param(
            "kernel", shifted_uniform,
            (self.kernel_size, self.features, self.in_ch), jnp.float32,
        )
        bias = self.param("bias", shifted_uniform, (self.features,), jnp.float32)
        return kernel, bias


class _DenseParams(nn.Module):
    """Creates params identical to nn.Dense(param_dtype=f32), returned raw."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class LayerWiseProjHeadParams(nn.Module):
    """Param tree of LayerWiseProjHead (upsampler/ + lin_proj/) without compute."""

    in_dim: int
    out_dim: int
    enable_tr_layer: bool = True
    tr_reduce_factor: int = 2

    @nn.compact
    def __call__(self):
        up = (
            _ConvTransposeParams(
                features=self.in_dim, kernel_size=self.tr_reduce_factor,
                in_ch=self.in_dim, name="upsampler",
            )()
            if self.enable_tr_layer
            else None
        )
        lin = (
            _DenseParams(features=self.out_dim, in_dim=self.in_dim, name="lin_proj")()
            if self.in_dim != self.out_dim
            else None
        )
        return up, lin


def _dot_operands(a, b, dtype):
    """Operands for a batched dot in compute dtype. The CPU thunk runtime
    cannot execute batched bf16 x bf16 dots (see SplitLinear), so off-TPU
    the inputs are ROUNDED to the compute dtype first (matching TPU's input
    quantization exactly) and the dot itself runs in f32."""
    a = a.astype(dtype)
    b = b.astype(dtype)
    if jax.default_backend() == "cpu" and jnp.dtype(dtype) != jnp.float32:
        return a.astype(jnp.float32), b.astype(jnp.float32)
    return a, b


def batched_layerwise_proj(hiddens, head_params, dtype):
    """All L projection heads as two batched einsums.

    hiddens: list of L (B, T, C) layer outputs; head_params: list of L
    (up, lin) tuples from LayerWiseProjHeadParams. Returns (B, L, T', D).

    Numerically equivalent to applying L LayerWiseProjHeads (upsample
    einsum accumulates f32 then casts, Dense runs in compute dtype), but
    lowers to 2 large MXU matmuls instead of 24 small ones, and keeps the
    per-slot loss reduces from fusing into 12 pathological
    dot-in-reduce-fusion kernels (measured ~10x their roofline on v5e).
    """
    h = jnp.stack(hiddens, axis=0)  # (L, B, T, C)
    l, b, t, _c = h.shape
    up0, lin0 = head_params[0]
    if up0 is not None:
        # stack of (K, O, C) kernels and (O,) biases
        wk = jnp.stack([up[0] for (up, _) in head_params], axis=0)  # (L,K,O,C)
        wb = jnp.stack([up[1] for (up, _) in head_params], axis=0)  # (L,O)
        k = wk.shape[1]
        # downcast BEFORE the (t, k) flatten so the forced relayout copies
        # half the bytes, and add the bias in compute dtype — mirrors
        # ConvTranspose1D's k == s branch exactly (the gradient-equality
        # test pins the two paths to each other)
        y = jnp.einsum(
            "lbtc,lkoc->lbtko", *_dot_operands(h, wk, dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        y = y.reshape(l, b, t * k, wk.shape[2]) + wb[:, None, None, :].astype(dtype)
    else:
        y = h.astype(dtype)
    if lin0 is not None:
        dk = jnp.stack([lin[0] for (_, lin) in head_params], axis=0)  # (L,I,O)
        db = jnp.stack([lin[1] for (_, lin) in head_params], axis=0)  # (L,O)
        out = jnp.einsum(
            "lbti,lio->blto", *_dot_operands(y, dk, dtype)
        ).astype(dtype)
        out = out + db.astype(dtype)[None, :, None, :]
    else:
        out = jnp.transpose(y, (1, 0, 2, 3))
    return out


class LayerWiseProjHead(nn.Module):
    """Per-layer head: ConvTranspose upsample (undo TR) + Linear to teacher dim."""

    in_dim: int
    out_dim: int
    enable_tr_layer: bool = True
    tr_reduce_factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.enable_tr_layer:
            x = ConvTranspose1D(
                features=self.in_dim,
                kernel_size=self.tr_reduce_factor,
                stride=self.tr_reduce_factor,
                dtype=self.dtype,
                name="upsampler",
            )(x)
        if self.in_dim != self.out_dim:
            x = nn.Dense(
                self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="lin_proj"
            )(x)
        return x


class MelSpecHead(nn.Module):
    """Conv head over mel features, stride 1, padding k//2, ReLU between layers.

    Input/output layout here is (B, T, C) (the reference uses (B, C, T)).
    """

    conv_layers: Tuple[Tuple[int, int, int], ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        n = len(self.conv_layers)
        for i, (dim, k, _stride) in enumerate(self.conv_layers):
            x = Conv1D(
                features=dim,
                kernel_size=k,
                stride=1,
                padding=(k // 2, k // 2),
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                name=f"conv_{i}",
            )(x)
            if i < n - 1:
                x = jax.nn.relu(x)
        return x
