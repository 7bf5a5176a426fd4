"""Pallas backward for the fused conv front-end (VERDICT r4 #3).

The fused forward (conv_frontend.py) streams tiles of the post-block-0 conv
stack through VMEM; its backward has so far been `jax.vjp` of the XLA
reference implementation — a full recompute whose conv-transpose (dx) and
conv-dw kernels run im2col-bound (38–70 TF/s; ~16 ms in-step for the student
stack, the largest single block above the measured roofline, README.md).

This kernel computes the whole stack backward per tile in VMEM:

  up pass    recompute a_i (layer inputs) and z_i (pre-GELU) for the tile's
             input span — the same tap-decomposed matmuls as the forward,
             activations held in the compute dtype exactly like XLA's
             recompute chain;
  down pass  for layer i = L-1..0 with g the grad at layer-i output frames:
               dz   = g * gelu'(z_i)
               dw_i[j] += tap_j(a_i)^T @ dz             (k matmuls on MXU)
               da_i  = sum_j place_j(dz @ W_i[j]^T)     (the fwd's gather
                        taps become scatter taps: pad+add, no gathers)
             da_i becomes g for layer i-1 (layer i-1 emits span_i frames,
             exactly the frames layer i consumes — same invariant as fwd).

dx tile windows OVERLAP (adjacent tiles share span - f_tile*prod input
rows), which BlockSpecs cannot express as an accumulating output: each
program emits its full (span, C0) window to a (B, n_tiles, span_pad, C0)
buffer and a cheap XLA overlap-add (reshape + one shifted add — the carry
region is < 2% of rows) folds them into da0.

dw accumulates ACROSS the whole grid into constant-index-map outputs (the
standard Pallas revisiting pattern: the TPU grid is sequential, the block
stays resident in VMEM). The f32 dw accumulators (~12 MB for the student
spec) push the kernel past the default 16 MB scoped-VMEM budget, so the
call raises `vmem_limit_bytes` explicitly.

The GroupNorm+GELU prefix (fused_conv_stack_gn) stays OUTSIDE: the caller
(_fused_gn_bwd) materializes a0 = gelu(gn(x)) once via the existing
`_gn_prefix` custom VJP (~120 MB bf16 at the student shape, ~0.3 ms round
trip), this kernel consumes a0 directly and returns d(a0), and the caller
backprops the prefix in XLA.

Gradient-parity oracle: `jax.vjp` of `_reference_stack` (the previous
backward), tested in interpret mode on CPU and on-chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fithubert_tpu.ops.pallas.conv_frontend import (
    Spec,
    _aligned_span,
    _erf,
    _out_len,
    _span_for,
    _stride_prod,
)

_SQRT_2_OVER_PI = 0.7978845608028654
_TANH_C3 = 0.044715
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad_exact(x):
    """d/dx of exact-erf GELU: Phi(x) + x * phi(x)."""
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(x * 0.7071067811865476))
    return cdf + x * phi


def _gelu_grad_tanh(x):
    """d/dx of jax.nn.gelu(approximate=True)'s tanh form."""
    u = _SQRT_2_OVER_PI * (x + _TANH_C3 * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _TANH_C3 * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _gelu_grad_for(dtype):
    """Match conv_frontend._gelu_for: exact for fp32, tanh for bf16."""
    if jnp.dtype(dtype) == jnp.float32:
        return _gelu_grad_exact
    return _gelu_grad_tanh


def _gelu_value_for(dtype):
    from fithubert_tpu.ops.pallas.conv_frontend import _gelu_for

    return _gelu_for(dtype)


def _layer_fwd_taps(a, kernel, k: int, s: int, f_out: int):
    """(span_in, C_in) -> pre-GELU (f_out, C_out); mirrors _layer_apply but
    returns z (no activation)."""
    c_in = a.shape[-1]
    need = (f_out + 1) * s
    if a.shape[0] < need:
        a = jnp.pad(a, ((0, need - a.shape[0]), (0, 0)))
    r = a[:need].reshape(f_out + 1, s, c_in)
    z = None
    for j in range(k):
        tap = r[:f_out, j] if j < s else r[1 : f_out + 1, j - s]
        contrib = jax.lax.dot_general(
            tap, kernel[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z = contrib if z is None else z + contrib
    return z


def _layer_bwd(a, dz, kernel, k: int, s: int, f_out: int, span_in: int):
    """Backward of one tap-decomposed conv layer within a tile.

    a: (span_in, C_in) layer input (f32); dz: (f_out, C_out) pre-GELU grad.
    Returns (da (span_in, C_in), dw (k, C_in, C_out))."""
    c_in = a.shape[-1]
    need = (f_out + 1) * s
    a_p = a if a.shape[0] >= need else jnp.pad(
        a, ((0, need - a.shape[0]), (0, 0)))
    r = a_p[:need].reshape(f_out + 1, s, c_in)

    dw_taps = []
    da_r = None
    for j in range(k):
        tap = r[:f_out, j] if j < s else r[1 : f_out + 1, j - s]
        # dw_j = tap^T @ dz : contract the frame dim
        dw_taps.append(jax.lax.dot_general(
            tap, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # da tap: dz @ W_j^T, placed at (row offset, column) = fwd's gather
        contrib = jax.lax.dot_general(
            dz, kernel[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (f_out, C_in)
        col = j if j < s else j - s
        rows = (0, 1) if j < s else (1, 0)
        placed = jnp.pad(
            contrib[:, None, :],
            (rows, (col, s - col - 1), (0, 0)),
        )  # (f_out + 1, s, C_in)
        da_r = placed if da_r is None else da_r + placed

    da = da_r.reshape(need, c_in)[:span_in]
    if span_in > need:  # cannot happen for k <= 2s, kept for clarity
        da = jnp.pad(da, ((0, span_in - need), (0, 0)))
    dw = jnp.stack(dw_taps, axis=0)
    return da, dw


def _make_bwd_kernel(spec: Spec, f_tile: int, span: int, span_pad0: int,
                     c0: int):
    n_layers = len(spec)

    def kernel(x_hbm, *args):
        # args layout: g, *weights, dwin, *dw_outs, x_vmem, sem
        g_ref = args[0]
        weight_refs = args[1 : 1 + n_layers]
        dwin_ref = args[1 + n_layers]
        dw_refs = args[2 + n_layers : 2 + 2 * n_layers]
        x_vmem = args[2 + 2 * n_layers]
        sem = args[3 + 2 * n_layers]

        b = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        prod = _stride_prod(spec)

        def dma(tile, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(tile * f_tile * prod, span), :],
                x_vmem.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _first():
            dma(t, slot).start()

        dma(t, slot).wait()

        @pl.when(t + 1 < nt)
        def _prefetch():
            dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        store_dtype = x_vmem.dtype
        gelu = _gelu_value_for(store_dtype)
        gelu_grad = _gelu_grad_for(store_dtype)

        # ---- up pass: recompute a_i (layer inputs) and z_i ---------------
        x = x_vmem[slot].astype(jnp.float32)
        # layer-to-layer values round through the compute dtype, exactly
        # like the XLA recompute chain the previous backward used
        a_store = [x.astype(store_dtype)]
        z_store = []
        for i, (_d, k, s) in enumerate(spec):
            f_next = _span_for(f_tile, spec[i + 1:])
            z = _layer_fwd_taps(
                a_store[i].astype(jnp.float32), weight_refs[i][:], k, s,
                f_next,
            )
            z_store.append(z.astype(store_dtype))
            a_store.append(gelu(z).astype(store_dtype))

        # ---- down pass ----------------------------------------------------
        is_first = jnp.logical_and(b == 0, t == 0)
        g_cur = g_ref[0].astype(jnp.float32)  # (f_tile, c_last)
        for i in reversed(range(n_layers)):
            _d, k, s = spec[i]
            f_out = _span_for(f_tile, spec[i + 1:])
            span_in = _span_for(f_tile, spec[i:])
            z32 = z_store[i].astype(jnp.float32)
            dz = g_cur * gelu_grad(z32)
            da, dw = _layer_bwd(
                a_store[i].astype(jnp.float32), dz, weight_refs[i][:],
                k, s, f_out, span_in,
            )

            @pl.when(is_first)
            def _init(dw_ref=dw_refs[i], dw=dw):
                dw_ref[...] = dw

            @pl.when(jnp.logical_not(is_first))
            def _acc(dw_ref=dw_refs[i], dw=dw):
                dw_ref[...] += dw

            g_cur = da

        # g_cur: (span_0, c0) grad wrt a0 — pad to the aligned window
        if span_pad0 > g_cur.shape[0]:
            g_cur = jnp.pad(
                g_cur, ((0, span_pad0 - g_cur.shape[0]), (0, 0)))
        dwin_ref[0, 0] = g_cur

    return kernel


def pallas_stack_bwd(x, weights: Sequence[jnp.ndarray], g, spec: Spec,
                     f_tile: int, interpret: bool = False,
                     valid_len: Optional[int] = None):
    """Full-stack backward. x/weights as given to the forward pallas call
    (x possibly pre-padded; weights in the compute dtype; for the GN-prefixed
    variant x is the materialized a0 — see the module docstring); g the
    cotangent of the CROPPED forward output (B, t_out, c_last).

    Returns (da0 (B, T0, C0) f32, dws tuple of f32 (k, C_in, C_out))."""
    b, t0, c0 = x.shape
    t_out = _out_len(t0 if valid_len is None else valid_len, spec)
    n_tiles = pl.cdiv(t_out, f_tile)
    span = _aligned_span(f_tile, spec)
    span_pad0 = span  # aligned window == da0 window
    prod = _stride_prod(spec)
    t_need = (n_tiles - 1) * f_tile * prod + span
    if t_need > t0:
        x = jnp.pad(x, ((0, 0), (0, t_need - t0), (0, 0)))

    c_last = spec[-1][0]
    # zero-pad g to whole tiles: the pad frames are the fwd's cropped
    # garbage frames, so their cotangent is exactly zero
    if g.shape[1] < n_tiles * f_tile:
        g = jnp.pad(g, ((0, 0), (0, n_tiles * f_tile - g.shape[1]), (0, 0)))

    dw_shapes = []
    c_in = c0
    for (d, k, _s) in spec:
        dw_shapes.append((k, c_in, d))
        c_in = d

    # VMEM budget: f32 dw accumulators + resident weights + the tile's
    # stored activations — past the default 16 MB scoped limit for the
    # student spec, so raise it for this kernel alone.
    dw_bytes = sum(4 * k * ci * co for (k, ci, co) in dw_shapes)
    w_bytes = sum(int(w.size) * w.dtype.itemsize for w in weights)
    act_bytes = 0
    for i in range(len(spec) + 1):
        ci = c0 if i == 0 else spec[i - 1][0]
        act_bytes += 2 * _span_for(f_tile, spec[i:]) * ci \
            * jnp.dtype(x.dtype).itemsize
    vmem_limit = int(
        (dw_bytes + w_bytes + 2 * act_bytes + 2 * span * c0 * 4
         + span_pad0 * c0 * 4) * 1.5
    ) + (8 << 20)

    dwin, *dws = pl.pallas_call(
        _make_bwd_kernel(spec, f_tile, span, span_pad0, c0),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, f_tile, c_last), lambda i, t: (i, t, 0)),
            *[
                pl.BlockSpec(w.shape, lambda i, t: (0,) * w.ndim,
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
        ],
        out_specs=[
            pl.BlockSpec((1, 1, span_pad0, c0), lambda i, t: (i, t, 0, 0)),
            *[
                pl.BlockSpec(shape, lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
                for shape in dw_shapes
            ],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles, span_pad0, c0), jnp.float32),
            *[jax.ShapeDtypeStruct(shape, jnp.float32) for shape in dw_shapes],
        ],
        scratch_shapes=[
            pltpu.VMEM((2, span, c0), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, g, *weights)

    # ---- overlap-add of the dx windows ------------------------------------
    owned = f_tile * prod
    tail_len = span_pad0 - owned
    assert 0 <= tail_len <= owned, (span_pad0, owned)
    main = dwin[:, :, :owned]                      # (B, nt, owned, C0)
    if tail_len == 0:
        # all-k==s stacks with a 32-aligned span: windows are disjoint
        da0 = main.reshape(b, n_tiles * owned, c0)
    else:
        tails = dwin[:, :, owned:]                 # (B, nt, tail,  C0)
        carry = jnp.pad(
            tails, ((0, 0), (0, 0), (0, owned - tail_len), (0, 0)))
        carry = jnp.pad(carry, ((0, 0), (1, 0), (0, 0), (0, 0)))  # shift 1
        summed = main + carry[:, :n_tiles]
        da0 = jnp.concatenate(
            [summed.reshape(b, n_tiles * owned, c0), carry[:, n_tiles]],
            axis=1,
        )
    if da0.shape[1] < t0:
        da0 = jnp.pad(da0, ((0, 0), (0, t0 - da0.shape[1]), (0, 0)))
    else:
        da0 = da0[:, :t0]
    return da0, tuple(dws)
