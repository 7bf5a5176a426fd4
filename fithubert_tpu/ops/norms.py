"""Normalization layers computed in float32 regardless of activation dtype.

TPU equivalents of fairseq Fp32LayerNorm / Fp32GroupNorm (used by the
reference extractor, modules/module.py:54-71) and the plain LayerNorm used
throughout the encoder. Computing the statistics in fp32 while keeping bf16
activations is the standard TPU mixed-precision recipe; the cast back to the
input dtype keeps downstream matmuls on the MXU in bf16.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class FP32LayerNorm(nn.Module):
    """LayerNorm over the trailing dim, stats + affine applied in fp32."""

    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.use_affine:
            dim = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            y = y * scale + bias
        return y.astype(orig_dtype)


class FP32GroupNorm(nn.Module):
    """GroupNorm over (C, T) for inputs shaped (B, T, C), fp32 stats.

    The reference's first extractor block uses torch GroupNorm(d, d) — i.e.
    num_groups == num_channels, so each channel is normalized over time alone
    (reference modules/module.py:69). `num_groups` generalizes that.
    """

    num_groups: int
    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        # x: (B, T, C)
        b, t, c = x.shape
        if return_params:
            # fused-kernel path: hand out (scale, bias) so a pallas kernel can
            # apply the fold itself; the param tree stays identical
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            return scale, bias
        assert c % self.num_groups == 0, (c, self.num_groups)
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32).reshape(b, t, self.num_groups, c // self.num_groups)
        # torch GroupNorm normalizes over (channels-in-group, spatial) jointly
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        var = jnp.var(x32, axis=(1, 3), keepdims=True)
        y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = y.reshape(b, t, c)
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(orig_dtype)
