"""1-D convolution building blocks in channels-last (B, T, C) layout.

Channels-last keeps the contraction dimension on the TPU lane axis so XLA can
tile conv-as-matmul onto the MXU without transposes. Parity targets:
  - ConvFeatureExtractor  ≙ reference modules/module.py:24-102
  - PositionalConv        ≙ reference modules/module.py:186-208 (weight-norm,
                            SamePad, GELU) and the multi-layer variant :155-183
  - ConvTranspose1D       ≙ torch nn.ConvTranspose1d (upsampler,
                            reference modules/model.py:342-348)
  - grad_multiply         ≙ fairseq GradMultiply (reference modules/model.py:431)
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fithubert_tpu.ops.activations import gelu_exact
from fithubert_tpu.ops.norms import FP32GroupNorm, FP32LayerNorm

Initializer = nn.initializers.Initializer


def _conv_dn():
    # lhs (B, T, C), rhs (K, C_in/g, C_out), out (B, T', C_out)
    return jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NHC", "HIO", "NHC"))


kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class Conv1D(nn.Module):
    """Strided 1-D convolution, (B, T, C_in) -> (B, T', C_out).

    Kernel stored as (K, C_in/groups, C_out) so the importer maps torch's
    (C_out, C_in/g, K) via a transpose.
    """

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    padding: Tuple[int, int] = (0, 0)
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Optional[Initializer] = None  # None = torch uniform(+-1/sqrt(fan_in))
    dtype: Optional[jnp.dtype] = None

    def _bias_init(self, in_ch: int) -> Initializer:
        if self.bias_init is not None:
            return self.bias_init
        # torch nn.Conv1d default: uniform(-1/sqrt(fan_in), +) with
        # fan_in = (C_in / groups) * kernel_size
        bound = 1.0 / math.sqrt(max(1, (in_ch // self.groups) * self.kernel_size))

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return init

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, in_ch // self.groups, self.features),
            jnp.float32,
        )
        if return_kernel:
            # fused-stack path: the caller consumes the raw kernel (and bias)
            # so a multi-layer pallas kernel can run the conv itself while
            # the param tree stays byte-identical to the unfused path
            bias = (
                self.param("bias", self._bias_init(in_ch), (self.features,),
                           jnp.float32)
                if self.use_bias
                else None
            )
            return kernel, bias
        dtype = self.dtype or x.dtype
        if (self.kernel_size == self.stride and self.groups == 1
                and self.padding == (0, 0)):
            # non-overlapping taps (e.g. the TR conv1d, k == s): fold the
            # window into the contraction — one MXU matmul instead of XLA's
            # strided-conv lowering
            b, t, _c = x.shape
            t_out = t // self.stride
            r = x[:, : t_out * self.stride].reshape(b, t_out, self.stride, in_ch)
            y = jnp.einsum(
                "btsc,sco->bto", r.astype(dtype), kernel.astype(dtype),
                preferred_element_type=jnp.float32,
            )
        elif (self.groups == 1 and self.padding == (0, 0)
              and self.stride < self.kernel_size
              and self.kernel_size <= 2 * self.stride
              and in_ch * self.kernel_size <= 32):
            # wav front block (k <= 2s, tiny fan-in): tap-decomposed matmul.
            # lax.conv here forced a whole-activation relayout copy in front
            # of the fused pallas stack (r4 xplane trace: XLA picks a
            # {2,0,1} conv output layout while the pallas custom call needs
            # the default {2,1,0} — 1.64 ms/step teacher + 0.42 student at
            # the release geometry); a dot emits the standard layout
            # directly. The im2col tensor is (B, T, k*in_ch) — tiny at the
            # in_ch == 1 this gate admits. Tap j < s reads window row f,
            # tap j >= s row f+1 (same trick as the pallas stack).
            b, t_in, _ = x.shape
            k, s = self.kernel_size, self.stride
            # clamp: floor-div goes negative for t_in < k; lax.conv's VALID
            # contract is an explicit 0-frame output there
            t_out = max(0, (t_in - k) // s + 1)
            need = (t_out + 1) * s
            xx = x if t_in >= need else jnp.pad(
                x, ((0, 0), (0, need - t_in), (0, 0)))
            r = xx[:, :need].reshape(b, t_out + 1, s * in_ch)
            im2col = jnp.concatenate(
                [r[:, :t_out], r[:, 1:]], axis=-1)[..., : k * in_ch]
            y = jnp.einsum(
                "btk,ko->bto", im2col.astype(dtype),
                kernel.reshape(k * in_ch, self.features).astype(dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            if self.groups > 1 and self.stride == 1:
                # grouped stride-1 (multi-layer pos conv, conformer
                # depthwise): custom VJP computes the input-grad as a
                # forward grouped conv (see grouped_conv_same)
                conv = lambda x_, k_: grouped_conv_same(
                    x_, k_, self.padding, self.groups
                )
            else:
                conv = lambda x_, k_: jax.lax.conv_general_dilated(
                    x_,
                    k_,
                    window_strides=(self.stride,),
                    padding=[self.padding],
                    dimension_numbers=_conv_dn(),
                    feature_group_count=self.groups,
                )
            if self.groups > 1:
                # GSPMD replicates grouped convs instead of batch-partitioning
                # them; under a kernel mesh run per-shard explicitly
                from fithubert_tpu.parallel import batch_shard_map

                y = batch_shard_map(conv, x.astype(dtype), kernel.astype(dtype))
            else:
                y = conv(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", self._bias_init(in_ch), (self.features,),
                              jnp.float32)
            y = y + bias
        return y.astype(dtype)


class ConvTranspose1D(nn.Module):
    """Transposed 1-D convolution matching torch nn.ConvTranspose1d.

    Output length = (T - 1) * stride + kernel_size (padding=0). Kernel stored
    as (K, C_out, C_in); importer maps torch's (C_in, C_out, K).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch default init: uniform(-1/sqrt(fan_in), +) with fan_in = C_in*K
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)
        uniform = nn.initializers.uniform(scale=2 * bound)

        def shifted_uniform(key, shape, dtype=jnp.float32):
            return uniform(key, shape, dtype) - bound

        kernel = self.param(
            "kernel", shifted_uniform, (self.kernel_size, self.features, in_ch), jnp.float32
        )
        dtype = self.dtype or x.dtype
        if self.kernel_size == self.stride:
            # non-overlapping taps (the TR-upsampler case, k == s == factor):
            # out[t*s + j] = x[t] @ W_j — one MXU matmul + interleave, ~10x
            # faster on TPU than XLA's lhs-dilated conv lowering (measured
            # 3.3 TF/s for the dilated form at FitHuBERT shapes)
            b, t, _c = x.shape
            # cast to the compute dtype BEFORE the (t, k) -> t*k flatten:
            # the tiled-layout relayout that reshape forces then moves half
            # the bytes (an r4 trace measured 1.34 ms/step of f32 copy +
            # reshape here at release shapes). f32 accumulation in the dot
            # is preserved; only the bias add moves to the compute dtype
            # (a no-op in fp32 mode).
            y = jnp.einsum(
                "btc,koc->btko", x.astype(dtype), kernel.astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype).reshape(b, t * self.kernel_size, self.features)
        else:
            # conv_transpose == conv with lhs dilation `stride`, full padding,
            # spatially-flipped kernel, and in/out channels swapped.
            flipped = jnp.flip(kernel, axis=0)  # (K, C_out, C_in)
            rhs = jnp.transpose(flipped, (0, 2, 1))  # (K, C_in, C_out) for HIO
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                rhs.astype(dtype),
                window_strides=(1,),
                padding=[(self.kernel_size - 1, self.kernel_size - 1)],
                lhs_dilation=(self.stride,),
                dimension_numbers=_conv_dn(),
            )
        if self.use_bias:
            bias = self.param("bias", shifted_uniform, (self.features,), jnp.float32)
            # add in y's dtype: y + fp32 bias would promote the whole tensor
            # back to f32 (and un-do the pre-reshape downcast above)
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class ConvFeatureExtractor(nn.Module):
    """Waveform (B, T) -> features (B, T', C): the strided conv front-end.

    Reference modules/module.py:24-102. `default` mode = GroupNorm(d, d) on
    block 0 only; `layer_norm` mode = per-block fp32 LayerNorm. GELU (exact)
    after every block; kaiming-normal conv init; optional bias.
    """

    conv_layers: Tuple[Tuple[int, int, int], ...]
    mode: str = "default"
    conv_bias: bool = False
    dropout: float = 0.0
    use_fused: bool = True  # fused pallas stack for blocks 1..N (TPU)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.mode in ("default", "layer_norm")
        x = x[..., None]  # (B, T, 1)

        convs = [
            Conv1D(
                features=dim,
                kernel_size=k,
                stride=stride,
                use_bias=self.conv_bias,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            for i, (dim, k, stride) in enumerate(self.conv_layers)
        ]

        rest_spec = tuple(self.conv_layers[1:])
        fused_ok = False
        if self.use_fused and self.mode == "default" and not self.conv_bias \
                and self.dropout == 0.0 and len(rest_spec) > 0:
            from fithubert_tpu.ops.pallas.conv_frontend import fusable

            fused_ok = fusable(rest_spec)

        # block-0 conv via XLA; in the fused path its GroupNorm + GELU fold
        # into the pallas kernel's prefix (only the fp32 stats reduce stays
        # in XLA), so the normalized tensor never round-trips HBM
        dim0, k0, s0 = self.conv_layers[0]
        valid_len = None
        if fused_ok:
            # pre-pad the WAV so block 0 emits the kernel's DMA-aligned
            # length directly, instead of an XLA pad op copying the whole
            # block-0 activation again (a measured ~1.7 ms/step at release
            # shapes). Rows past valid_len are partial-window garbage; no
            # valid output frame reads them, and GN stats exclude them.
            from fithubert_tpu.ops.pallas.conv_frontend import (
                padded_input_len, pick_f_tile)

            t1 = (x.shape[1] - k0) // s0 + 1
            itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
            f_tile = pick_f_tile(dim0, rest_spec, itemsize)
            if f_tile and t1 > 0:
                t_need = padded_input_len(t1, rest_spec, f_tile)
                if t_need > t1:
                    x = jnp.pad(x, ((0, 0), (0, (t_need - t1) * s0), (0, 0)))
                    valid_len = t1
        x = convs[0](x)
        gn = (FP32GroupNorm(num_groups=dim0, name="group_norm")
              if self.mode == "default" else None)

        if fused_ok:
            from fithubert_tpu.ops.pallas.conv_frontend import conv_stack

            gn_params = gn(x, return_params=True) if gn is not None else None
            kernels = []
            c_in = x.shape[-1]
            for conv, (dim, _k, _s) in zip(convs[1:], rest_spec):
                kern, _bias = conv(jnp.zeros((1, 1, c_in), x.dtype),
                                   return_kernel=True)
                kernels.append(kern)
                c_in = dim
            return conv_stack(x, kernels, rest_spec, gn_params=gn_params,
                              valid_len=valid_len)

        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.mode == "layer_norm":
            x = FP32LayerNorm(name="layer_norm_0")(x)
        elif gn is not None:
            x = gn(x)
        x = gelu_exact(x)

        for i, (dim, k, stride) in enumerate(self.conv_layers[1:], start=1):
            x = convs[i](x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if self.mode == "layer_norm":
                x = FP32LayerNorm(name=f"layer_norm_{i}")(x)
            x = gelu_exact(x)
        return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv_same(x, kernel, pad, groups):
    """Grouped stride-1 conv (the pos-conv shape class: k=128, g=16) whose
    input-grad is expressed as another FORWARD grouped conv.

    XLA's grouped conv-transpose kernel runs ~1.8x slower than its forward
    at the release shape ((12,600,480) bf16, measured on v5e via
    step_trace.py: fwd fusion 1.78 ms vs input-grad fusion 3.29 ms), so the
    backward builds the group-wise flipped/transposed kernel and calls the
    fast forward path; the weight-grad keeps XLA's own formulation via
    jax.vjp. Math: dx[b,s,ci] = sum_{k',co in grp(ci)} dy_pad[b,s+k',co] *
    W[K-1-k', ci_local, co] — a grouped conv of dy with W flipped in k and
    in/out channels swapped within each group.
    """
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[pad],
        dimension_numbers=_conv_dn(), feature_group_count=groups,
    )


def _gc_fwd(x, kernel, pad, groups):
    return grouped_conv_same(x, kernel, pad, groups), (x, kernel)


def _gc_bwd(pad, groups, res, dy):
    x, kernel = res
    k, cin_g, cout = kernel.shape
    cout_g = cout // groups
    # (k, ci_l, g, co_l) -flip k, swap ci/co-> (k, co_l, g, ci_l)
    w4 = kernel.reshape(k, cin_g, groups, cout_g)
    wt = jnp.flip(w4, 0).transpose(0, 3, 2, 1).reshape(
        k, cout_g, groups * cin_g
    )
    # barrier: XLA:TPU's simplifier otherwise folds the flip/transpose BACK
    # into the conv as window rhs_reversal + swapped dim_labels — the exact
    # slow transposed orientation this rewrite avoids (measured at the
    # release shape: folded 3.39 ms vs barriered 1.85, bit-identical —
    # scripts/posconv_dx_probe.py; the materialized weight reverse is ~3.5 MB)
    wt = wt.astype(dy.dtype)
    if os.environ.get("FITHUBERT_POSCONV_DX", "barrier") != "folded":
        wt = jax.lax.optimization_barrier(wt)
    dx = jax.lax.conv_general_dilated(
        dy, wt, window_strides=(1,),
        padding=[(k - 1 - pad[0], k - 1 - pad[1])],
        dimension_numbers=_conv_dn(), feature_group_count=groups,
    ).astype(x.dtype)
    _, vjp_w = jax.vjp(
        lambda w: jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[pad],
            dimension_numbers=_conv_dn(), feature_group_count=groups,
        ),
        kernel,
    )
    (dkernel,) = vjp_w(dy)
    return dx, dkernel


grouped_conv_same.defvjp(_gc_fwd, _gc_bwd)


class PositionalConv(nn.Module):
    """Grouped, weight-normalized conv positional embedding + SamePad + GELU.

    Reference modules/module.py:186-208. Weight norm is over torch dim=2
    (per kernel position): w[:, :, k] = g[k] * v[:, :, k] / ||v[:, :, k]||.
    We store `weight_v` as (K, C/g, C) and `weight_g` as (K,).
    """

    embed_dim: int
    kernel_size: int = 128
    groups: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        e, k, g = self.embed_dim, self.kernel_size, self.groups
        std = math.sqrt(4.0 / (k * e))

        def v_init(key, shape, dtype=jnp.float32):
            return std * jax.random.normal(key, shape, dtype)

        def g_init(key, shape, dtype=jnp.float32):
            # E[||v_k||] for v ~ N(0, std^2) over (C/g * C) entries
            return jnp.full(shape, std * math.sqrt(e * e / g), dtype)

        weight_v = self.param("weight_v", v_init, (k, e // g, e), jnp.float32)
        weight_g = self.param("weight_g", g_init, (k,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (e,), jnp.float32)

        norm = jnp.sqrt(jnp.sum(weight_v**2, axis=(1, 2), keepdims=True) + 1e-12)
        kernel = weight_v * (weight_g[:, None, None] / norm)

        dtype = self.dtype or x.dtype
        pad = k // 2
        from fithubert_tpu.parallel import batch_shard_map

        # grouped conv: GSPMD replicates it under a mesh; shard_map keeps it
        # batch-parallel (no-op single-chip). grouped_conv_same's custom VJP
        # computes the input-grad as a forward grouped conv (~1.8x XLA's
        # grouped conv-transpose at this shape on v5e).
        y = batch_shard_map(
            lambda x_, k_: grouped_conv_same(x_, k_, (pad, pad), g),
            x.astype(dtype),
            kernel.astype(dtype),
        ).astype(dtype)
        y = y + bias.astype(dtype)
        if k % 2 == 0:  # SamePad: drop trailing step for even kernels
            y = y[:, :-1, :]
        return gelu_exact(y)


class MultiLayerPositionalConv(nn.Module):
    """pos_conv_depth > 1 variant (reference modules/module.py:155-183):
    stacked [Conv1d(k, pad=k//2, groups) + SamePad + LayerNorm(no affine) + GELU].
    """

    embed_dim: int
    depth: int
    kernel_size: int
    groups: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = max(3, self.kernel_size // self.depth)
        for i in range(self.depth):
            x = Conv1D(
                features=self.embed_dim,
                kernel_size=k,
                groups=self.groups,
                padding=(k // 2, k // 2),
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if k % 2 == 0:
                x = x[:, :-1, :]
            x = FP32LayerNorm(use_affine=False, name=f"layer_norm_{i}")(x)
            x = gelu_exact(x)
        return x




@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_multiply(x, scale: float):
    return x


def _grad_multiply_fwd(x, scale):
    return x, None


def _grad_multiply_bwd(scale, _res, g):
    return (g * scale,)


grad_multiply.defvjp(_grad_multiply_fwd, _grad_multiply_bwd)
