"""Normalization layers computed in float32 regardless of activation dtype.

TPU equivalents of fairseq Fp32LayerNorm / Fp32GroupNorm (used by the
reference extractor, modules/module.py:54-71) and the plain LayerNorm used
throughout the encoder. Computing the statistics in fp32 while keeping bf16
activations is the standard TPU mixed-precision recipe; the cast back to the
input dtype keeps downstream matmuls on the MXU in bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _ln_forward_math(x, scale, bias, eps):
    """The (pre-custom-VJP) forward, kept verbatim for bit-identity: fp32
    stats with jnp.var's two-pass E[(x-mean)^2] and reciprocal(sqrt(.))."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x32 - mean) * rstd
    if scale is not None:
        y = y * scale + bias
    return y.astype(x.dtype), mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fp32_layer_norm(x, scale, bias, eps):
    """LayerNorm over the trailing dim with a hand-written backward.

    Same recipe that bought +3.3% on the GroupNorm prefix (conv_frontend
    _gn_prefix, commits 4012c58/26ec14e), applied to the 25+ encoder
    LayerNorms: autodiff of the fp32 stats chain materializes several full
    f32 copies of the activation in the backward; the classic LN backward
    is one reduce pass and one apply pass, both reading the compute-dtype
    residuals and accumulating f32 in-register:

      dx_c = rstd * (h_c - S1/N - xhat_c * S2/N)
      h = dy * gamma,  S1 = sum_c h,  S2 = sum_c h * xhat

    (reductions along the LANE dim, N = C). The forward is bit-identical to
    the previous flax autodiff version."""
    return _ln_fwd(x, scale, bias, eps)[0]


def _ln_fwd(x, scale, bias, eps):
    y, mean, rstd = _ln_forward_math(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


def _ln_bwd(eps, res, dy):
    x, scale, mean, rstd = res
    n = x.shape[-1]
    xhat = (x.astype(jnp.float32) - mean) * rstd  # recomputed, fuses
    dy32 = dy.astype(jnp.float32)
    h = dy32 * scale if scale is not None else dy32
    s1 = jnp.mean(h, axis=-1, keepdims=True)
    s2 = jnp.mean(h * xhat, axis=-1, keepdims=True)
    dx = (rstd * (h - s1 - xhat * s2)).astype(x.dtype)
    if scale is None:
        return dx, None, None
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dy32 * xhat, axis=red)
    dbias = jnp.sum(dy32, axis=red)
    return dx, dscale, dbias


_fp32_layer_norm.defvjp(_ln_fwd, _ln_bwd)


class FP32LayerNorm(nn.Module):
    """LayerNorm over the trailing dim, stats + affine applied in fp32."""

    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        scale = bias = None
        if self.use_affine:
            dim = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        import os

        if os.environ.get("FITHUBERT_LN_VJP", "custom").lower() == "autodiff":
            # A/B escape hatch: plain autodiff of the same forward math
            return _ln_forward_math(x, scale, bias, self.epsilon)[0]
        return _fp32_layer_norm(x, scale, bias, self.epsilon)


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
