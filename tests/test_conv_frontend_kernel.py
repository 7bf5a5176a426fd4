"""Fused conv front-end Pallas kernel vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.ops.pallas.conv_frontend import (
    _out_len,
    _reference_stack,
    _span_for,
    fusable,
    fused_conv_stack,
)

# the FitHuBERT student spec after block 0 (reference
# data/conf/fithubert.yaml conv_feature_layers, blocks 1..8)
STUDENT_SPEC = ((256, 1, 1), (256, 3, 2), (256, 3, 2), (256, 3, 2),
                (256, 3, 2), (512, 1, 1), (512, 2, 2), (512, 2, 2))
# fairseq teacher spec after block 0
TEACHER_SPEC = ((512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                (512, 2, 2), (512, 2, 2))
TINY_SPEC = ((32, 3, 2), (48, 2, 2), (48, 1, 1))


def _weights(spec, c_in, seed=0):
    rng = np.random.default_rng(seed)
    ws = []
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, c_in, d)) * 0.1, jnp.float32))
        c_in = d
    return tuple(ws)


def test_fusable():
    assert fusable(STUDENT_SPEC)
    assert fusable(TEACHER_SPEC)
    assert not fusable(((64, 5, 2),))  # k > 2s


def test_span_math():
    t = 1000
    assert _out_len(_span_for(7, TINY_SPEC), TINY_SPEC) == 7


@pytest.mark.parametrize("spec,c_in,t0", [
    (TINY_SPEC, 16, 700),
    (TINY_SPEC, 16, 517),   # non-multiple tail
    (TEACHER_SPEC[:3], 24, 900),
])
def test_fused_matches_oracle(spec, c_in, t0):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, t0, c_in)) * 0.5, jnp.float32)
    ws = _weights(spec, c_in)
    want = _reference_stack(x, list(ws), spec)
    got = fused_conv_stack(x, ws, spec, 16, True)  # f_tile 16, interpret
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_backward_matches_oracle():
    spec, c_in, t0 = TINY_SPEC, 16, 600
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, t0, c_in)) * 0.5, jnp.float32)
    ws = _weights(spec, c_in)

    def loss_fused(x, ws):
        return jnp.sum(fused_conv_stack(x, ws, spec, 16, True) ** 2)

    def loss_ref(x, ws):
        return jnp.sum(_reference_stack(x, list(ws), spec) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, ws)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=3e-4, rtol=1e-4)
    for a, b in zip(gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_extractor_param_tree_identical_fused_vs_not():
    from fithubert_tpu.ops.conv import ConvFeatureExtractor

    spec = ((16, 10, 5), (32, 3, 2), (32, 2, 2))
    wav = jnp.zeros((1, 2000))
    pa = ConvFeatureExtractor(conv_layers=spec, use_fused=True).init(
        jax.random.PRNGKey(0), wav)
    pb = ConvFeatureExtractor(conv_layers=spec, use_fused=False).init(
        jax.random.PRNGKey(0), wav)
    sa = jax.tree.map(lambda x: tuple(x.shape), pa)
    sb = jax.tree.map(lambda x: tuple(x.shape), pb)
    assert sa == sb
    # off-TPU both dispatch to XLA: outputs must be bit-identical
    oa = ConvFeatureExtractor(conv_layers=spec, use_fused=True).apply(pa, wav)
    ob = ConvFeatureExtractor(conv_layers=spec, use_fused=False).apply(pb, wav)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_valid_len_prepadded_matches_unpadded():
    """Pre-padding the input to padded_input_len + valid_len must reproduce
    the unpadded stack exactly (fwd + grads over the valid region) — the
    no-XLA-pad fast path used by ConvFeatureExtractor."""
    from fithubert_tpu.ops.pallas.conv_frontend import (
        fused_conv_stack_gn, padded_input_len)

    spec, c_in, t1 = TINY_SPEC, 16, 600
    f_tile = 16
    t_need = padded_input_len(t1, spec, f_tile)
    assert t_need > t1  # the case under test

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, t1, c_in)) * 0.5, jnp.float32)
    # garbage (not zeros) past valid_len: results must not depend on it
    junk = jnp.asarray(rng.standard_normal((2, t_need - t1, c_in)) * 9.0,
                       jnp.float32)
    xp = jnp.concatenate([x, junk], axis=1)
    ws = _weights(spec, c_in)
    gamma = jnp.asarray(rng.standard_normal(c_in) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c_in) * 0.1, jnp.float32)

    want = fused_conv_stack(x, ws, spec, f_tile, True)
    got = fused_conv_stack(xp, ws, spec, f_tile, True, t1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    want_gn = fused_conv_stack_gn(x, ws, gamma, beta, spec, f_tile, True)
    got_gn = fused_conv_stack_gn(xp, ws, gamma, beta, spec, f_tile, True, t1)
    np.testing.assert_allclose(np.asarray(got_gn), np.asarray(want_gn),
                               atol=3e-5, rtol=1e-5)

    # grads w.r.t. the valid rows match the unpadded stack's
    def loss_pad(x_, ws_, ga, be):
        xp_ = jnp.concatenate([x_, junk], axis=1)
        return jnp.sum(
            fused_conv_stack_gn(xp_, ws_, ga, be, spec, f_tile, True, t1) ** 2)

    def loss_ref(x_, ws_, ga, be):
        return jnp.sum(_reference_stack(x_, list(ws_), spec, ga, be) ** 2)

    gp = jax.grad(loss_pad, argnums=(0, 1, 2, 3))(x, ws, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, ws, gamma, beta)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_extractor_prepad_matches_unfused_oracle():
    """Extractor-level: the fused path's wav pre-pad + valid_len gives the
    same features as the plain unfused stack (CPU oracle; last-ulp noise
    only — the sliced GN-stat reduce associates differently than the
    unsliced one, so bit-exactness is not expected)."""
    from fithubert_tpu.ops.conv import ConvFeatureExtractor

    spec = ((16, 10, 5), (32, 3, 2), (32, 2, 2))
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((2, 2000)) * 0.1, jnp.float32)
    pa = ConvFeatureExtractor(conv_layers=spec, use_fused=True).init(
        jax.random.PRNGKey(0), wav)
    oa = ConvFeatureExtractor(conv_layers=spec, use_fused=True).apply(pa, wav)
    ob = ConvFeatureExtractor(conv_layers=spec, use_fused=False).apply(pa, wav)
    assert oa.shape == ob.shape
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                               atol=2e-6, rtol=3e-4)


def test_gn_prefix_fused_matches_oracle():
    from fithubert_tpu.ops.pallas.conv_frontend import fused_conv_stack_gn

    spec, c_in, t0 = TINY_SPEC, 16, 600
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, t0, c_in)) * 0.5, jnp.float32)
    ws = _weights(spec, c_in)
    gamma = jnp.asarray(rng.standard_normal(c_in) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c_in) * 0.1, jnp.float32)

    want = _reference_stack(x, list(ws), spec, gamma, beta)
    got = fused_conv_stack_gn(x, ws, gamma, beta, spec, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)

    def loss_f(x, ws, gamma, beta):
        return jnp.sum(fused_conv_stack_gn(x, ws, gamma, beta, spec, 16, True) ** 2)

    def loss_r(x, ws, gamma, beta):
        return jnp.sum(_reference_stack(x, list(ws), spec, gamma, beta) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 2, 3))(x, ws, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 2, 3))(x, ws, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("dtype,valid_len", [
    (jnp.float32, None),
    (jnp.float32, 410),
    (jnp.bfloat16, None),
    (jnp.bfloat16, 410),
])
def test_gn_prefix_custom_vjp_matches_autodiff(dtype, valid_len):
    """The hand-written GN+GELU backward (classic two-pass formula) must
    match plain autodiff of the same math, including the valid_len stats
    slice and both GELU flavors (exact for f32, tanh for bf16)."""
    from fithubert_tpu.ops.pallas.conv_frontend import _gn_prefix

    rng = np.random.default_rng(7)
    b, t, c = 3, 512, 16
    x = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
    gamma = jnp.asarray(rng.standard_normal((c,)) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    def reference(x_, ga, be):
        # the same math WITHOUT the custom VJP
        x32 = x_.astype(jnp.float32)
        stats = x32 if valid_len is None else x32[:, :valid_len]
        mean = jnp.mean(stats, axis=1, keepdims=True)
        # same one-pass moments as _gn_prefix_fwd: the test pins the custom
        # BACKWARD against autodiff of the identical forward math
        var = jnp.maximum(jnp.mean(stats * stats, axis=1, keepdims=True)
                          - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ga + be
        approx = jnp.dtype(dtype) != jnp.float32
        return jax.nn.gelu(y, approximate=approx).astype(x_.dtype)

    dout = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
    if valid_len is not None:
        # rows past valid_len never receive cotangent in real use
        dout = dout.at[:, valid_len:].set(0)

    out_c, vjp_c = jax.vjp(lambda x_, g_, b_: _gn_prefix(x_, g_, b_, 1e-5,
                                                         valid_len),
                           x, gamma, beta)
    out_r, vjp_r = jax.vjp(reference, x, gamma, beta)
    np.testing.assert_allclose(np.asarray(out_c, np.float32),
                               np.asarray(out_r, np.float32), rtol=0, atol=0)
    dx_c, dg_c, db_c = vjp_c(dout)
    dx_r, dg_r, db_r = vjp_r(dout)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(dx_c, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dg_c), np.asarray(dg_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_c), np.asarray(db_r),
                               rtol=1e-4, atol=1e-4)
