"""Fused waveform-front-end conv stack as one Pallas kernel.

The reference's ConvFeatureExtractionModel (reference modules/module.py:24-102)
runs each strided Conv1d as a separate op: every intermediate activation makes
an HBM round trip. Block 0 (wide kernel + fp32 GroupNorm over the WHOLE time
axis — a global reduction) stays in XLA; all remaining blocks are local
(kernel k <= 2*stride for every standard fairseq/FitHuBERT spec), so this
kernel computes the entire post-block-0 stack for a tile of output frames in
VMEM: the block-0 features are read from HBM ONCE and only the final features
are written back.

Strided conv as MXU matmuls, no gathers: for a layer (k, s) with k <= 2s the
input span for F output frames is reshaped to (F+1, s, C) so tap j is
  j <  s : r[:, j][:F]
  j >= s : r[:, j - s][1 : F + 1]
and the layer is sum_j tap_j @ W_j — k matmuls of (F, C_in) x (C_in, C_out).

Backward = jax.vjp of the XLA reference implementation (custom_vjp): the
pallas kernel accelerates the forward; the backward recomputes with XLA convs
whose autodiff is exact, trading a little recompute for zero custom bwd code.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

Spec = Tuple[Tuple[int, int, int], ...]  # (dim, kernel, stride) per layer


def fusable(spec: Spec) -> bool:
    """The reshape trick needs k <= 2s (holds for all fairseq-style specs)."""
    return len(spec) > 0 and all(k <= 2 * s for (_d, k, s) in spec)


def _out_len(t: int, spec: Spec) -> int:
    for (_d, k, s) in spec:
        t = (t - k) // s + 1
    return t


def _span_for(f: int, spec: Spec) -> int:
    """Input frames needed for f output frames of the whole stack."""
    span = f
    for (_d, k, s) in reversed(spec):
        span = (span - 1) * s + k
    return span


def _aligned_span(f: int, spec: Spec) -> int:
    """DMA window: span rounded up to the sublane tiling (32 covers every
    dtype; the surplus frames are fetched but never used)."""
    return ((_span_for(f, spec) + 31) // 32) * 32


def _stride_prod(spec: Spec) -> int:
    p = 1
    for (_d, _k, s) in spec:
        p *= s
    return p


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7): Pallas TPU
    has no erf/erfc primitive, so exact GELU is built from exp only."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact (erf) GELU, matching jax.nn.gelu(approximate=False) to ~1e-7."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_for(dtype):
    """fp32 keeps the exact erf GELU; bf16 uses the tanh approximation —
    its ~1e-3 error is below bf16's own quantization step (2^-8 relative),
    and the rational erf costs ~1/3 of the whole kernel on the VPU."""
    if jnp.dtype(dtype) == jnp.float32:
        return _gelu_exact
    return lambda v: jax.nn.gelu(v, approximate=True)


def _layer_apply(x, kernel, k: int, s: int, f_out: int):
    """x (span, C_in) -> (f_out, C_out); kernel (k, C_in, C_out)."""
    c_in = x.shape[-1]
    need = f_out * s + s  # (f_out + 1) * s frames for the reshape trick
    if x.shape[0] < need:
        x = jnp.pad(x, ((0, need - x.shape[0]), (0, 0)))
    r = x[: (f_out + 1) * s].reshape(f_out + 1, s, c_in)
    out = None
    for j in range(k):
        tap = r[:f_out, j] if j < s else r[1 : f_out + 1, j - s]
        contrib = jax.lax.dot_general(
            tap, kernel[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = contrib if out is None else out + contrib
    return out


def _make_kernel(spec: Spec, f_tile: int, span: int, c_in: int,
                 with_norm: bool = False):
    n_layers = len(spec)

    def kernel(x_hbm, *args):
        # args = ([scale, shift,] *weight_refs, out_ref, x_vmem (2-slot), sem (2))
        if with_norm:
            scale_ref, shift_ref = args[0], args[1]
            args = args[2:]
        weight_refs = args[:n_layers]
        out_ref = args[n_layers]
        x_vmem = args[n_layers + 1]
        sem = args[n_layers + 2]

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

        # double buffering: wait on this tile's window, prefetch the next
        # one into the other slot while the conv stack computes
        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _first():
            dma(t, slot).start()

        dma(t, slot).wait()

        @pl.when(t + 1 < nt)
        def _prefetch():
            dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        # fp32 intermediates: measured faster than bf16 on the VPU (gelu/
        # reshape elementwise work), and the dots accumulate fp32 anyway
        gelu = _gelu_for(x_vmem.dtype)
        x = x_vmem[slot].astype(jnp.float32)
        if with_norm:
            # folded GroupNorm(d, d) prefix: y = x * (gamma * rstd) +
            # (beta - mean * rstd * gamma), stats precomputed in XLA fp32
            b_idx = pl.program_id(0)
            x = gelu(x * scale_ref[0, 0, :] + shift_ref[0, 0, :])
        for i, (_d, k, s) in enumerate(spec):
            # each layer emits exactly the frames the remaining stack needs:
            # span_for(f_tile, spec[i:]) frames in -> span_for(f_tile,
            # spec[i+1:]) frames out; the final layer lands on f_tile.
            f_next = _span_for(f_tile, spec[i + 1:])
            x = _layer_apply(x, weight_refs[i][:], k, s, f_next)
            x = gelu(x)
        out_ref[0] = x.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_prefix(x, gamma, beta, eps=1e-5, valid_len=None):
    """Per-channel-over-time GroupNorm(d, d) + GELU (the reference's block-0
    tail) in fp32 stats, matching ops/norms.FP32GroupNorm for groups == C.

    With valid_len, stats are computed over x[:, :valid_len] only (rows past
    it are DMA-alignment padding, see conv_stack's valid_len) but the affine
    is applied to every row — padded rows' values never reach a valid output
    frame, so only the stats must exclude them for parity.

    Custom VJP: autodiff of the one-pass stats materializes the whole
    activation in f32 several times (an r4 step trace priced the student
    block-0 GN backward at ~2 ms/step across add_add / multiply_reduce /
    slice_reduce fusions at (12, 38944, 128)). The hand-written backward is
    the classic GN formula — one reduce pass and one apply pass, both
    reading the bf16 residuals and accumulating in f32 in-register:

      dx_t = rstd * (h_t - [t < V] * (S1 + xhat_t * S2) / V)
      h = dL/dxhat,  S1 = sum_t h,  S2 = sum_t h * xhat

    where the S-sums run over ALL rows (every row's output uses the shared
    stats; rows past valid_len receive zero cotangent anyway) and only rows
    inside the stats population get the correction term."""
    return _gn_prefix_fwd(x, gamma, beta, eps, valid_len)[0]


def _gn_prefix_fwd(x, gamma, beta, eps, valid_len):
    x32 = x.astype(jnp.float32)
    stats = x32 if valid_len is None else x32[:, :valid_len]
    # one-pass E[x^2]-E[x]^2 moments, same as _fused_gn_fwd: jnp.var's
    # E[(x-mean)^2] lowers as a SECOND full read of the activation (~1 ms
    # at the student's (12, 38944, 128) — and this fwd re-runs inside the
    # training backward's stack recompute)
    mean = jnp.mean(stats, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(stats * stats, axis=1, keepdims=True)
                      - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * rstd * gamma + beta
    approx = jnp.dtype(x.dtype) != jnp.float32
    out = jax.nn.gelu(y, approximate=approx).astype(x.dtype)
    return out, (x, gamma, beta, mean, rstd)


def _gn_prefix_bwd(eps, valid_len, res, dout):
    x, gamma, beta, mean, rstd = res
    approx = jnp.dtype(x.dtype) != jnp.float32
    n = x.shape[1] if valid_len is None else valid_len
    xhat = (x.astype(jnp.float32) - mean) * rstd  # recomputed, fuses

    def tail(xh, ga, be):
        return jax.nn.gelu(xh * ga + be, approximate=approx).astype(x.dtype)

    # elementwise tail (affine + GELU) via autodiff: dgamma/dbeta fall out
    # with the right broadcast-sums, h = dL/dxhat
    _, tail_vjp = jax.vjp(tail, xhat, gamma, beta)
    h, dgamma, dbeta = tail_vjp(dout)
    s1 = jnp.sum(h, axis=1, keepdims=True)
    s2 = jnp.sum(h * xhat, axis=1, keepdims=True)
    corr = (s1 + xhat * s2) * (1.0 / n)
    if valid_len is not None and valid_len < x.shape[1]:
        in_stats = (jnp.arange(x.shape[1]) < valid_len)[None, :, None]
        corr = jnp.where(in_stats, corr, 0.0)
    dx = (rstd * (h - corr)).astype(x.dtype)
    return dx, dgamma, dbeta


_gn_prefix.defvjp(_gn_prefix_fwd, _gn_prefix_bwd)


def _reference_stack(x: jnp.ndarray, weights: Sequence[jnp.ndarray], spec: Spec,
                     gamma=None, beta=None, valid_len=None):
    """XLA oracle: plain strided convs + exact GELU (used off-TPU and for the
    backward pass). x: (B, T, C) channels-last; weights[i]: (k, C_in, C_out).
    valid_len marks rows past it as DMA-alignment padding: GN stats exclude
    them and the output is cropped to the frames the valid rows produce."""
    t_out = None if valid_len is None else _out_len(valid_len, spec)
    if gamma is not None:
        x = _gn_prefix(x, gamma, beta, 1e-5, valid_len)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NHC", "HIO", "NHC"))
    approx = jnp.dtype(x.dtype) != jnp.float32  # same flavor as the kernel
    for (w, (_d, k, s)) in zip(weights, spec):
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(s,), padding=[(0, 0)],
            dimension_numbers=dn,
        )
        x = jax.nn.gelu(x, approximate=approx)
    return x if t_out is None else x[:, :t_out]


def _pallas_stack(x, weights, spec: Spec, f_tile: int, interpret: bool,
                  scale=None, shift=None, valid_len=None):
    with_norm = scale is not None
    b, t0, c0 = x.shape
    t_out = _out_len(t0 if valid_len is None else valid_len, spec)
    n_tiles = pl.cdiv(t_out, f_tile)
    span = _aligned_span(f_tile, spec)
    prod = _stride_prod(spec)
    # pad input so every tile's DMA window exists
    t_need = (n_tiles - 1) * f_tile * prod + span
    if t_need > t0:
        x = jnp.pad(x, ((0, 0), (0, t_need - t0), (0, 0)))

    c_out = spec[-1][0]
    norm_inputs, norm_specs = (), ()
    if with_norm:
        norm_inputs = (scale.reshape(b, 1, c0), shift.reshape(b, 1, c0))
        norm_specs = (
            pl.BlockSpec((1, 1, c0), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, c0), lambda i, t: (i, 0, 0)),
        )
    out = pl.pallas_call(
        _make_kernel(spec, f_tile, span, c0, with_norm),
        grid=(b, n_tiles),
        in_specs=[
            # ANY-space arrays must be whole with a trivial index map (TPU
            # lowering rule); the kernel DMAs its own (batch, span) window
            pl.BlockSpec(memory_space=pltpu.ANY),
            *norm_specs,
            *[
                pl.BlockSpec(w.shape, lambda i, t: (0,) * w.ndim,
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
        ],
        out_specs=pl.BlockSpec((1, f_tile, c_out), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * f_tile, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, span, c0), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, *norm_inputs, *weights)
    return out[:, :t_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_conv_stack(x, weights, spec: Spec, f_tile: int = 128,
                     interpret: bool = False, valid_len=None):
    """(B, T, C_in) -> (B, T_out, C_out) through the conv+GELU stack."""
    return _pallas_stack(x, list(weights), spec, f_tile, interpret,
                         valid_len=valid_len)


def _fused_fwd(x, weights, spec, f_tile, interpret, valid_len):
    out = _pallas_stack(x, list(weights), spec, f_tile, interpret,
                        valid_len=valid_len)
    return out, (x, tuple(weights))


def _pallas_bwd_enabled() -> bool:
    """Gate for the Pallas backward kernel (VERDICT r4 #3) — MEASURED
    NEGATIVE on v5e, default OFF. On-chip grads match the oracle (dx 0.006 /
    dw 0.008 rel, bf16 release spec), but solo fwd+grad at the student shape
    is 13.6 ms (kernel) vs 8.9 ms (XLA), and in-step the full KD bench drops
    14.20 -> 13.00 steps/s (-8.5%): XLA's conv-transpose/dw kernels
    parallelize the whole (B, T) while the tile kernel serializes a 16-layer
    up+down chain of small matmuls per program; batching the per-tap matmuls
    into two wide ones made it WORSE (17.3 ms — the mid-dim slice+reshape
    relayouts cost more than the fusion saves). FITHUBERT_CONV_BWD=pallas
    opts in (capacity/experiments); the kernel stays grad-parity-tested."""
    import os

    return os.environ.get("FITHUBERT_CONV_BWD", "xla").lower() == "pallas"


def _fused_bwd(spec, f_tile, interpret, valid_len, res, g):
    x, weights = res
    # NOTE: a matmul-tap-decomposition VJP in XLA (_matmul_stack) was tried
    # here and measured 2x SLOWER than XLA's native conv VJPs on v5e (31.7 ms
    # vs 16.3 ms for the student spec at B=12 x 12 s) — XLA's conv transpose
    # kernels beat the pad/slice adjoint chain. The PALLAS backward
    # (conv_frontend_bwd) recomputes + backprops whole tiles in VMEM instead.
    if _pallas_bwd_enabled():
        from fithubert_tpu.ops.pallas.conv_frontend_bwd import pallas_stack_bwd

        da0, dws = pallas_stack_bwd(
            x, list(weights), g, spec, f_tile, interpret,
            valid_len=valid_len)
        return da0.astype(x.dtype), tuple(
            dw.astype(w.dtype) for dw, w in zip(dws, weights))
    _, vjp = jax.vjp(
        lambda x_, ws: _reference_stack(x_, ws, spec, valid_len=valid_len),
        x, weights)
    dx, dws = vjp(g.astype(x.dtype))
    return dx, dws


fused_conv_stack.defvjp(_fused_fwd, _fused_bwd)


def _weight_bytes(c0: int, spec: Spec, itemsize: int) -> int:
    total, c_in = 0, c0
    for (d, k, _s) in spec:
        total += k * c_in * d * itemsize
        c_in = d
    return total


def _vmem_estimate(f_tile: int, c0: int, spec: Spec, itemsize: int) -> int:
    """Rough per-program VMEM bytes: resident weights + the largest live
    intermediates per layer (compute-dtype storage, fp32 dot outputs) plus
    the DMA'd input window."""
    peak = _aligned_span(f_tile, spec) * c0 * 4
    c_in = c0
    for i, (d, _k, _s) in enumerate(spec):
        span_in = _span_for(f_tile, spec[i:])
        span_out = _span_for(f_tile, spec[i + 1:])
        live = (span_in * c_in + 2 * span_out * d) * 4
        peak = max(peak, live)
        c_in = d
    return peak + _weight_bytes(c0, spec, itemsize)


def pick_f_tile(c0: int, spec: Spec, itemsize: int = 2,
                budget: int = 12 << 20) -> int:
    # 32 measured fastest in-graph on v5e (64 fits VMEM for the student spec
    # but loses pipelining overlap; 16 adds per-program overhead)
    for f in (32, 16, 8):
        if _vmem_estimate(f, c0, spec, itemsize) <= budget:
            return f
    return 0  # does not fit: caller falls back to XLA


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_conv_stack_gn(x, weights, gamma, beta, spec: Spec, f_tile: int,
                        interpret: bool = False, valid_len=None):
    """Like fused_conv_stack but with the block-0 GroupNorm(d,d) + GELU
    folded into the kernel's prefix (stats via a cheap XLA fp32 reduce)."""
    out, _ = _fused_gn_fwd(x, weights, gamma, beta, spec, f_tile, interpret,
                           valid_len)
    return out


def _fused_gn_fwd(x, weights, gamma, beta, spec, f_tile, interpret,
                  valid_len=None):
    x32 = (x if valid_len is None else x[:, :valid_len]).astype(jnp.float32)
    # one-pass moments: jnp.var is E[(x-mean)^2], which XLA lowers as a
    # SECOND full read of the block-0 activation (~1 ms at the teacher's
    # 472 MB on v5e); E[x^2]-E[x]^2 fuses both stats into one pass. fp32
    # accumulation over ~38k O(1) values keeps the cancellation error
    # ~1e-5 relative — below the kernel's own bf16 quantization.
    mean = jnp.mean(x32, axis=1)  # (B, C)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=1) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    scale = (rstd * gamma[None, :]).astype(x.dtype)
    shift = (beta[None, :] - mean * rstd * gamma[None, :]).astype(x.dtype)
    out = _pallas_stack(x, list(weights), spec, f_tile, interpret,
                        scale=scale, shift=shift, valid_len=valid_len)
    return out, (x, tuple(weights), gamma, beta)


def _fused_gn_bwd(spec, f_tile, interpret, valid_len, res, g):
    x, weights, gamma, beta = res
    if _pallas_bwd_enabled():
        from fithubert_tpu.ops.pallas.conv_frontend_bwd import pallas_stack_bwd

        # split the chain at a0 = gelu(gn(x)): the conv stack backward runs
        # in the pallas kernel; the GN+GELU prefix backward is the existing
        # hand-written _gn_prefix VJP in XLA. a0 is materialized once
        # (~120 MB bf16 at the student shape, ~0.3 ms round trip) — far
        # cheaper than the full-stack XLA recompute this replaces.
        a0, prefix_vjp = jax.vjp(
            lambda x_, ga, be: _gn_prefix(x_, ga, be, 1e-5, valid_len),
            x, gamma, beta)
        da0, dws = pallas_stack_bwd(
            a0, list(weights), g, spec, f_tile, interpret,
            valid_len=valid_len)
        dx, dgamma, dbeta = prefix_vjp(da0.astype(a0.dtype))
        return dx, tuple(
            dw.astype(w.dtype) for dw, w in zip(dws, weights)
        ), dgamma, dbeta
    _, vjp = jax.vjp(
        lambda x_, ws, ga, be: _reference_stack(x_, ws, spec, ga, be,
                                                valid_len=valid_len),
        x, weights, gamma, beta,
    )
    return vjp(g.astype(x.dtype))


fused_conv_stack_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def padded_input_len(t1: int, spec: Spec, f_tile: int) -> int:
    """Input length whose every DMA tile window exists without an XLA pad.

    A caller that controls the producer of the (B, t1, C) input (e.g. the
    block-0 conv over the raw wav) can pre-pad the PRODUCER's input so this
    many rows come out directly — the rows past t1 are garbage, which is
    fine: no output frame of the valid range reads them (pass valid_len=t1
    to conv_stack). Kills a full HBM round trip of the block-0 activation
    (the measured 1.4 ms pad op on the teacher spec at B=12 x 12 s)."""
    t_out = _out_len(t1, spec)
    n_tiles = pl.cdiv(t_out, f_tile)
    return (n_tiles - 1) * f_tile * _stride_prod(spec) + \
        _aligned_span(f_tile, spec)


def conv_stack(x, weights, spec: Spec, interpret: bool = False,
               gn_params=None, valid_len=None):
    """Dispatch: pallas on TPU (or interpret), XLA oracle elsewhere / for
    non-fusable specs or stacks whose weights would blow VMEM. Under an
    active kernel mesh (parallel.use_kernel_mesh) the fused path runs inside
    a shard_map over the 'data' (batch) axis with replicated weights — GSPMD
    cannot partition a pallas_call itself.

    valid_len: rows of x past it are DMA-alignment padding from a pre-padded
    producer (padded_input_len); outputs are those of an x[:, :valid_len]
    input and GN stats exclude the padding."""
    from fithubert_tpu.ops.pallas import interpret_forced

    interpret = interpret or interpret_forced()
    on_tpu = jax.devices()[0].platform == "tpu"
    # the per-tile DMA slices the channel (lane) dim whole: it must be
    # 128-lane aligned (true for the standard 128/256/512-wide specs)
    lane_ok = x.shape[-1] % 128 == 0
    if (on_tpu or interpret) and fusable(spec) and (lane_ok or interpret):
        # weights ride along in the compute dtype (the MXU accumulates in
        # fp32 regardless; fp32 weights for a 512-wide stack alone would
        # exceed the 16M scoped-VMEM limit)
        itemsize = jnp.dtype(x.dtype).itemsize
        f_tile = pick_f_tile(x.shape[-1], spec, itemsize)
        if f_tile:
            ws = tuple(w.astype(x.dtype) for w in weights)

            def _fused(x_, ws_, gn_):
                if gn_ is not None:
                    return fused_conv_stack_gn(x_, ws_, gn_[0], gn_[1], spec,
                                               f_tile, interpret, valid_len)
                return fused_conv_stack(x_, ws_, spec, f_tile, interpret,
                                        valid_len)

            from fithubert_tpu.parallel import current_kernel_mesh

            mesh = current_kernel_mesh()
            if mesh is not None and x.shape[0] % mesh.shape.get("data", 1) == 0:
                return jax.shard_map(
                    _fused,
                    mesh=mesh,
                    in_specs=(P("data", None, None), P(), P()),
                    out_specs=P("data", None, None),
                    check_vma=False,
                )(x, ws, gn_params)
            if mesh is None:
                return _fused(x, ws, gn_params)
            # ragged batch under a mesh: fall through to the XLA oracle,
            # which GSPMD partitions natively
    if gn_params is not None:
        return _reference_stack(x, list(weights), spec, *gn_params,
                                valid_len=valid_len)
    return _reference_stack(x, list(weights), spec, valid_len=valid_len)
