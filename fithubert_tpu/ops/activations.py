"""Exact GELU in the erf formulation.

The reference applies torch's exact GELU after every conv block and FFN
(reference modules/module.py:70,537 via nn.GELU / F.gelu), which torch
defines as ``0.5 * x * (1 + erf(x / sqrt(2)))``.  ``jax.nn.gelu(
approximate=False)`` in this JAX version instead expands through erfc
(``x/2 * erfc(-x/sqrt(2))``), and XLA's f32 erfc is a ~50-op two-branch
rational with an ``exp`` and two ``divide``s.  An on-chip step trace showed
that chain — evaluated on the (B, T, 3072) fc1 output INSIDE each teacher
fc2 fusion — inflating all 12 ``convert_reduce_fusion``s to 0.476 ms
against the 0.217 ms of the FLOP-identical bare fc1 matmuls (~36% vs ~79%
MFU; see artifacts/step_trace_r4c.txt).

The erf form lowers to one small rational, matches torch's own
formulation, and differs from the erfc form only by float rounding in the
deep-negative tail where gelu(x) is denormal-scale anyway.  Stats are
computed in f32 regardless of input dtype, mirroring jax.nn.gelu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """``0.5 * x * (1 + erf(x / sqrt(2)))`` — exact GELU, erf-lowered.

    Sub-f32 inputs compute in f32 (mirroring jax.nn.gelu); f32 and wider
    stay in their own dtype so an x64 run keeps full precision."""
    xf = x.astype(jnp.float32) if jnp.dtype(x.dtype).itemsize < 4 else x
    return (0.5 * xf * (1.0 + jax.lax.erf(xf * _INV_SQRT2))).astype(x.dtype)
