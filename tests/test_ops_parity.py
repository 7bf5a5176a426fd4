"""Golden parity of the L2 building blocks against torch oracles.

Each test builds the torch equivalent of a block (the reference delegates to
torch/fairseq primitives, SURVEY.md §2.8), copies weights into our flax
params, and compares forward outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn_t

from fithubert_tpu.ops.conv import Conv1D, ConvTranspose1D, PositionalConv
from fithubert_tpu.ops.norms import FP32GroupNorm, FP32LayerNorm
from fithubert_tpu.ops.attention import MultiHeadSelfAttention
from fithubert_tpu.ops.heads import SplitLinear

TOL = dict(rtol=2e-4, atol=2e-5)


def to_j(x):
    return jnp.asarray(x.detach().numpy())


def test_conv1d_matches_torch(np_rng):
    B, T, Cin, Cout, K, S = 2, 50, 8, 16, 5, 3
    x = np_rng.standard_normal((B, T, Cin)).astype(np.float32)
    tconv = nn_t.Conv1d(Cin, Cout, K, stride=S, bias=True)
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)

    conv = Conv1D(features=Cout, kernel_size=K, stride=S)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch weight (Cout, Cin, K) -> ours (K, Cin, Cout)
    params = {"params": {
        "kernel": to_j(tconv.weight.permute(2, 1, 0)),
        "bias": to_j(tconv.bias),
    }}
    out = conv.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_grouped_conv1d_matches_torch(np_rng):
    B, T, C, K, G = 2, 40, 16, 7, 4
    x = np_rng.standard_normal((B, T, C)).astype(np.float32)
    tconv = nn_t.Conv1d(C, C, K, groups=G, padding=K // 2)
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)

    conv = Conv1D(features=C, kernel_size=K, groups=G, padding=(K // 2, K // 2))
    params = {"params": {
        "kernel": to_j(tconv.weight.permute(2, 1, 0)),
        "bias": to_j(tconv.bias),
    }}
    out = conv.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_conv_transpose_matches_torch(np_rng):
    """Upsampler parity (reference modules/model.py:342-348 ConvTranspose1d)."""
    B, T, C, F = 2, 25, 12, 2
    x = np_rng.standard_normal((B, T, C)).astype(np.float32)
    tconv = nn_t.ConvTranspose1d(C, C, kernel_size=F, stride=F)
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)

    conv = ConvTranspose1D(features=C, kernel_size=F, stride=F)
    # torch weight (Cin, Cout, K) -> ours (K, Cout, Cin)
    params = {"params": {
        "kernel": to_j(tconv.weight.permute(2, 1, 0)),
        "bias": to_j(tconv.bias),
    }}
    out = conv.apply(params, jnp.asarray(x))
    assert out.shape == (B, T * F, C)
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_fp32_layernorm_matches_torch(np_rng):
    x = np_rng.standard_normal((3, 7, 32)).astype(np.float32)
    tln = nn_t.LayerNorm(32)
    with torch.no_grad():
        tln.weight.uniform_(0.5, 1.5)
        tln.bias.uniform_(-0.5, 0.5)
    ref = tln(torch.from_numpy(x))
    ln = FP32LayerNorm()
    params = {"params": {"scale": to_j(tln.weight), "bias": to_j(tln.bias)}}
    out = ln.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_fp32_groupnorm_matches_torch(np_rng):
    """GroupNorm(d, d) as in the extractor's first block (modules/module.py:69)."""
    B, T, C = 2, 30, 16
    x = np_rng.standard_normal((B, T, C)).astype(np.float32)
    tgn = nn_t.GroupNorm(C, C)
    with torch.no_grad():
        tgn.weight.uniform_(0.5, 1.5)
        tgn.bias.uniform_(-0.5, 0.5)
    ref = tgn(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    gn = FP32GroupNorm(num_groups=C)
    params = {"params": {"scale": to_j(tgn.weight), "bias": to_j(tgn.bias)}}
    out = gn.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)

    # grouped (num_groups < C) variant
    tgn2 = nn_t.GroupNorm(4, C)
    ref2 = tgn2(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    gn2 = FP32GroupNorm(num_groups=4)
    params2 = {"params": {"scale": to_j(tgn2.weight), "bias": to_j(tgn2.bias)}}
    out2 = gn2.apply(params2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out2), ref2.detach().numpy(), **TOL)


def test_positional_conv_weight_norm_matches_torch(np_rng):
    """pos_conv parity incl. weight-norm fold (reference modules/module.py:186-208)."""
    B, T, E, K, G = 2, 64, 32, 16, 4
    x = np_rng.standard_normal((B, T, E)).astype(np.float32)

    tconv = nn_t.Conv1d(E, E, kernel_size=K, padding=K // 2, groups=G)
    tconv = nn_t.utils.weight_norm(tconv, name="weight", dim=2)
    seq = nn_t.Sequential(tconv)
    xt = torch.from_numpy(x).transpose(1, 2)
    y = tconv(xt)
    if K % 2 == 0:
        y = y[:, :, :-1]
    ref = nn_t.functional.gelu(y.transpose(1, 2))

    pc = PositionalConv(embed_dim=E, kernel_size=K, groups=G)
    params = {"params": {
        # torch weight_v (E, E/G, K) -> ours (K, E/G, E); weight_g (1,1,K) -> (K,)
        "weight_v": to_j(tconv.weight_v.permute(2, 1, 0)),
        "weight_g": to_j(tconv.weight_g.reshape(-1)),
        "bias": to_j(tconv.bias),
    }}
    out = pc.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_mha_matches_torch_semantics(np_rng):
    """fairseq MHA semantics: q*scaling, -inf key mask, fp32 softmax.

    Oracle: torch.nn.MultiheadAttention (same math as fairseq's)."""
    B, T, E, H = 2, 10, 16, 4
    x = np_rng.standard_normal((B, T, E)).astype(np.float32)
    pad = np.zeros((B, T), bool)
    pad[1, 7:] = True

    tmha = nn_t.MultiheadAttention(E, H, batch_first=True)
    ref, _ = tmha(
        torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
        key_padding_mask=torch.from_numpy(pad), need_weights=False,
    )

    mha = MultiHeadSelfAttention(embed_dim=E, num_heads=H, use_pallas=False)
    w = tmha.in_proj_weight.detach().numpy()
    b = tmha.in_proj_bias.detach().numpy()
    params = {"params": {
        "q_proj": {"kernel": jnp.asarray(w[:E].T), "bias": jnp.asarray(b[:E])},
        "k_proj": {"kernel": jnp.asarray(w[E:2*E].T), "bias": jnp.asarray(b[E:2*E])},
        "v_proj": {"kernel": jnp.asarray(w[2*E:].T), "bias": jnp.asarray(b[2*E:])},
        "out_proj": {"kernel": to_j(tmha.out_proj.weight.T),
                     "bias": to_j(tmha.out_proj.bias)},
    }}
    out, taps = mha.apply(params, jnp.asarray(x), jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)
    assert taps.attn_logits is None

    # taps: logits must be (B*H, T, T) with -inf at padded keys
    out2, taps2 = mha.apply(params, jnp.asarray(x), jnp.asarray(pad), need_taps=True)
    assert taps2.attn_logits.shape == (B * H, T, T)
    assert np.isneginf(np.asarray(taps2.attn_logits[H, 0, 7]))
    assert taps2.v_rel.shape == (B * H, T, T)


def test_split_linear_matches_reference_einsum(np_rng):
    """SplitLinear einsum parity (reference modules/module.py:606-619)."""
    B, T, N, Din, Dout = 2, 5, 3, 8, 6
    x = np_rng.standard_normal((B, T, N * Din)).astype(np.float32)
    w = np_rng.standard_normal((N, Din, Dout)).astype(np.float32)
    bias = np_rng.standard_normal((1, 1, N, Dout)).astype(np.float32)

    xt = torch.from_numpy(x).reshape(B, T, N, 1, Din)
    ref = torch.einsum("...klm,kmn->...kln", xt, torch.from_numpy(w)).squeeze(3)
    ref = (ref + torch.from_numpy(bias)).reshape(B, T, -1)

    sl = SplitLinear(in_dim=Din, in_split=N, out_dim=Dout)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(bias)}}
    out = sl.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), **TOL)


def test_grad_multiply():
    from fithubert_tpu.ops.conv import grad_multiply

    g = jax.grad(lambda x: jnp.sum(grad_multiply(x, 0.25) ** 2))(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), 0.5 * np.ones(4), rtol=1e-6)


def test_scan_layers_equals_unrolled():
    """The scanned encoder must match the unrolled loop on the same params
    to float-reassociation tolerance (scan is the CPU default while TPU
    ships unrolled — real divergence would make test coverage lie about
    prod; XLA fuses the two program shapes differently, so bit equality is
    not expected)."""
    import dataclasses

    from fithubert_tpu.config import StudentConfig
    from fithubert_tpu.ops.transformer import TransformerEncoder

    base = StudentConfig(
        encoder_layers=3, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        enable_tr_layer=True, tr_layer_type="conv1d", tr_layer_index=1,
        tr_reduce_factor=2, required_seq_len_multiple=1,
        use_pallas_attention=False, dropout=0.0, attention_dropout=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 24, 32)), jnp.float32
    )
    mask = jnp.zeros((2, 24), bool).at[1, 16:].set(True)

    outs = {}
    for scan in (False, True):
        cfg = dataclasses.replace(base, scan_layers=scan)
        enc = TransformerEncoder(cfg=cfg)
        if scan is False:
            variables = enc.init(jax.random.PRNGKey(0), x, mask)
        out = enc.apply(variables, x, mask, deterministic=True)
        outs[scan] = out
    np.testing.assert_allclose(
        np.asarray(outs[True].x), np.asarray(outs[False].x),
        rtol=1e-5, atol=1e-6,
    )
    assert len(outs[True].layer_results) == len(outs[False].layer_results) == 3
    for (h1, _t1, l1), (h0, _t0, l0) in zip(
        outs[True].layer_results, outs[False].layer_results
    ):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_conv_custom_vjp_matches_autodiff():
    """grouped_conv_same expresses the input-grad as a forward grouped conv
    (the pos-conv perf path); its custom VJP must equal XLA autodiff of the
    plain conv exactly, for even and odd kernels."""
    from fithubert_tpu.ops.conv import _conv_dn, grouped_conv_same

    rng = np.random.default_rng(0)
    for (b, t, c, g, k) in [(2, 50, 32, 4, 16), (1, 37, 24, 8, 9)]:
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c // g, c)) * 0.1, jnp.float32)
        pad = (k // 2, k // 2)

        def ref(x, w):
            return jnp.sum(jnp.sin(jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[pad],
                dimension_numbers=_conv_dn(), feature_group_count=g)))

        def ours(x, w):
            return jnp.sum(jnp.sin(grouped_conv_same(x, w, pad, g)))

        np.testing.assert_allclose(ref(x, w), ours(x, w), rtol=1e-6)
        gr = jax.grad(ref, argnums=(0, 1))(x, w)
        go = jax.grad(ours, argnums=(0, 1))(x, w)
        for a, bb in zip(gr, go):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-5, rtol=1e-5)


def test_batched_layerwise_proj_equals_per_head_modules():
    """The batched (L, ...) einsum head path is a drop-in for L separate
    LayerWiseProjHead modules: byte-identical param tree (names, shapes,
    init values) and matching outputs."""
    from flax import linen as nn_f

    from fithubert_tpu.ops.heads import (
        LayerWiseProjHead,
        LayerWiseProjHeadParams,
        batched_layerwise_proj,
    )

    L, B, T, C, D = 4, 2, 10, 16, 24
    key = jax.random.PRNGKey(0)
    hs = [jax.random.normal(jax.random.PRNGKey(i + 1), (B, T, C)) for i in range(L)]

    class PerHead(nn_f.Module):
        @nn_f.compact
        def __call__(self, hs):
            return [
                LayerWiseProjHead(
                    in_dim=C, out_dim=D, enable_tr_layer=True,
                    tr_reduce_factor=2, name=f"proj_head_{i}",
                )(hs[i])
                for i in range(L)
            ]

    class Batched(nn_f.Module):
        @nn_f.compact
        def __call__(self, hs):
            hp = [
                LayerWiseProjHeadParams(
                    in_dim=C, out_dim=D, enable_tr_layer=True,
                    tr_reduce_factor=2, name=f"proj_head_{i}",
                )()
                for i in range(L)
            ]
            return batched_layerwise_proj(hs, hp, jnp.float32)

    p1 = PerHead().init(key, hs)
    p2 = Batched().init(key, hs)
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

    out1 = PerHead().apply(p1, hs)  # list of (B, 2T, D)
    out2 = Batched().apply(p1, hs)  # (B, L, 2T, D) — same params apply to both
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(out1[i]), np.asarray(out2[:, i]), rtol=0, atol=2e-6,
            err_msg=f"head {i}",
        )


def test_batched_layerwise_proj_grads_match_per_head():
    """Gradients through the batched einsum path match the per-head modules
    (params AND hiddens) — the train step differentiates through this."""
    from flax import linen as nn_f

    from fithubert_tpu.ops.heads import (
        LayerWiseProjHead,
        LayerWiseProjHeadParams,
        batched_layerwise_proj,
    )

    L, B, T, C, D = 3, 2, 6, 8, 12
    key = jax.random.PRNGKey(42)
    hs = [jax.random.normal(jax.random.PRNGKey(i + 7), (B, T, C)) for i in range(L)]
    tgt = jax.random.normal(jax.random.PRNGKey(99), (B, L, 2 * T, D))

    class PerHead(nn_f.Module):
        @nn_f.compact
        def __call__(self, hs):
            outs = [
                LayerWiseProjHead(
                    in_dim=C, out_dim=D, enable_tr_layer=True,
                    tr_reduce_factor=2, name=f"proj_head_{i}",
                )(hs[i])
                for i in range(L)
            ]
            return jnp.stack(outs, axis=1)

    class Batched(nn_f.Module):
        @nn_f.compact
        def __call__(self, hs):
            hp = [
                LayerWiseProjHeadParams(
                    in_dim=C, out_dim=D, enable_tr_layer=True,
                    tr_reduce_factor=2, name=f"proj_head_{i}",
                )()
                for i in range(L)
            ]
            return batched_layerwise_proj(hs, hp, jnp.float32)

    params = PerHead().init(key, hs)

    def loss_per(p, hs):
        return jnp.sum((PerHead().apply(p, hs) - tgt) ** 2)

    def loss_bat(p, hs):
        return jnp.sum((Batched().apply(p, hs) - tgt) ** 2)

    g1p, g1h = jax.grad(loss_per, argnums=(0, 1))(params, hs)
    g2p, g2h = jax.grad(loss_bat, argnums=(0, 1))(params, hs)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1p)[0],
        jax.tree_util.tree_flatten_with_path(g2p)[0],
    ):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=str(k1)
        )
    for a, b in zip(g1h, g2h):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_gelu_exact_matches_jax_and_torch(np_rng):
    """ops/activations.gelu_exact (erf form, the perf-critical lowering) ==
    jax.nn.gelu(approximate=False) (erfc form) == torch's exact GELU."""
    from fithubert_tpu.ops.activations import gelu_exact

    x = np_rng.standard_normal(4096).astype(np.float32) * 4.0
    ours = np.asarray(gelu_exact(jnp.asarray(x)))
    jaxs = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    tor = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    # abs-tol floor: the erf and erfc forms differ by float rounding in the
    # deep-negative tail where gelu(x) ~ 1e-30 (relative error unbounded,
    # absolute error ulp-scale -- the documented, accepted divergence)
    np.testing.assert_allclose(ours, jaxs, rtol=1e-5, atol=3e-6)
    np.testing.assert_allclose(ours, tor, rtol=1e-5, atol=3e-6)

    # gradients agree too (the VJP is what the train step runs)
    g_ours = np.asarray(jax.grad(lambda v: gelu_exact(v).sum())(jnp.asarray(x)))
    g_jax = np.asarray(jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False).sum())(jnp.asarray(x)))
    np.testing.assert_allclose(g_ours, g_jax, rtol=1e-4, atol=1e-5)


def test_fp32_layer_norm_custom_vjp_matches_autodiff():
    """The hand-written LN backward (VERDICT r4 #2) must match plain
    autodiff of the same forward math — for dx, dscale, dbias, affine and
    non-affine, f32 and bf16 inputs."""
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.ops.norms import _ln_forward_math, _fp32_layer_norm

    rng = np.random.default_rng(3)
    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.standard_normal((4, 37, 64)), dtype)
        scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(64), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
        dy = jnp.asarray(rng.standard_normal((4, 37, 64)), dtype)

        def loss_ref(x, s, b):
            y, _, _ = _ln_forward_math(x, s, b, 1e-5)
            return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

        def loss_custom(x, s, b):
            y = _fp32_layer_norm(x, s, b, 1e-5)
            return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        got = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w, np.float32),
                rtol=tol, atol=tol)

        # non-affine variant (conv extractor layer_norm mode)
        def loss_ref_na(x):
            y, _, _ = _ln_forward_math(x, None, None, 1e-5)
            return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

        def loss_custom_na(x):
            return jnp.sum(
                _fp32_layer_norm(x, None, None, 1e-5).astype(jnp.float32)
                * dy.astype(jnp.float32))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_custom_na)(x), np.float32),
            np.asarray(jax.grad(loss_ref_na)(x), np.float32),
            rtol=tol, atol=tol)

        # forward bit-identity with the pre-VJP implementation
        y_ref, _, _ = _ln_forward_math(x, scale, bias, 1e-5)
        y_new = _fp32_layer_norm(x, scale, bias, 1e-5)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
