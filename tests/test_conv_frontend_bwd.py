"""Pallas conv-front-end BACKWARD kernel vs the XLA-vjp oracle (VERDICT r4
#3): dx and per-layer dw parity in interpret mode, across the plain and
GN-prefixed stacks, f32 and bf16 flavors, valid_len pre-padding, and the
student release spec.

The oracle is `jax.vjp` of `_reference_stack` — the backward the kernel
replaces (and still the runtime fallback under FITHUBERT_CONV_BWD=xla).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.ops.pallas.conv_frontend import (
    _out_len,
    _reference_stack,
    fused_conv_stack,
    fused_conv_stack_gn,
    padded_input_len,
    pick_f_tile,
)
from fithubert_tpu.ops.pallas.conv_frontend_bwd import pallas_stack_bwd

SPEC_SMALL = ((32, 1, 1), (32, 3, 2), (64, 2, 2))
# the release student spec after block 0 (configs/fithubert.yaml)
SPEC_STUDENT = ((256, 1, 1),) + ((256, 3, 2),) * 4 + ((512, 1, 1),) \
    + ((512, 2, 2),) * 2


def _make_inputs(spec, c0, b=2, t=200, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c0)), dtype) * 0.5
    ws, cin = [], c0
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(
            rng.standard_normal((k, cin, d)) * (1.0 / np.sqrt(k * cin)),
            dtype))
        cin = d
    t_out = _out_len(t, spec)
    g = jnp.asarray(rng.standard_normal((b, t_out, spec[-1][0])), dtype)
    return x, ws, g, t_out


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-6), (jnp.bfloat16, 5e-2)])
def test_bwd_matches_xla_vjp(dtype, tol):
    x, ws, g, _ = _make_inputs(SPEC_SMALL, c0=16, dtype=dtype)
    _, vjp = jax.vjp(
        lambda x_, ws_: _reference_stack(x_, ws_, SPEC_SMALL), x, tuple(ws))
    dx_ref, dws_ref = vjp(g)
    da0, dws = pallas_stack_bwd(x, ws, g, SPEC_SMALL, f_tile=8,
                                interpret=True)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)

    assert rel(da0[:, : x.shape[1]], dx_ref) < tol
    for dw, dwr in zip(dws, dws_ref):
        assert rel(dw, dwr) < tol


def test_bwd_valid_len_matches_oracle():
    """Pre-padded producer rows (valid_len) must not leak into gradients."""
    spec = SPEC_SMALL
    valid = 150
    t_pad = padded_input_len(valid, spec, f_tile=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, t_pad, 16)), jnp.float32)
    ws, cin = [], 16
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, cin, d)) * 0.1,
                              jnp.float32))
        cin = d
    t_out = _out_len(valid, spec)
    g = jnp.asarray(rng.standard_normal((2, t_out, spec[-1][0])), jnp.float32)
    _, vjp = jax.vjp(
        lambda x_, ws_: _reference_stack(x_, ws_, spec, valid_len=valid),
        x, tuple(ws))
    dx_ref, dws_ref = vjp(g)
    da0, dws = pallas_stack_bwd(x, ws, g, spec, f_tile=8, interpret=True,
                                valid_len=valid)
    np.testing.assert_allclose(np.asarray(da0), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)
    for dw, dwr in zip(dws, dws_ref):
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr),
                                   rtol=1e-4, atol=1e-5)


def test_fused_conv_stack_grads_use_pallas_bwd(monkeypatch):
    """End-to-end custom-vjp: grads of the fused stack with the pallas
    backward equal the env-forced XLA backward."""
    x, ws, g, _ = _make_inputs(SPEC_SMALL, c0=16)

    def loss(x, ws):
        out = fused_conv_stack(x, tuple(ws), SPEC_SMALL, 8, True)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    monkeypatch.setenv("FITHUBERT_CONV_BWD", "xla")
    dx_ref, dws_ref = jax.grad(loss, argnums=(0, 1))(x, tuple(ws))
    monkeypatch.setenv("FITHUBERT_CONV_BWD", "pallas")
    dx, dws = jax.grad(loss, argnums=(0, 1))(x, tuple(ws))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)
    for dw, dwr in zip(dws, dws_ref):
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr),
                                   rtol=1e-4, atol=1e-5)


def test_fused_gn_stack_grads_match_xla_chain(monkeypatch):
    """The GN-prefixed variant: d(x, weights, gamma, beta) through the
    split pallas-stack + XLA-prefix backward vs the full XLA chain."""
    c0 = 16
    x, ws, g, _ = _make_inputs(SPEC_SMALL, c0=c0, seed=3)
    rng = np.random.default_rng(4)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c0), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c0), jnp.float32)

    def loss(x, ws, gamma, beta):
        out = fused_conv_stack_gn(x, tuple(ws), gamma, beta, SPEC_SMALL, 8,
                                  True)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    monkeypatch.setenv("FITHUBERT_CONV_BWD", "xla")
    ref = jax.grad(loss, argnums=(0, 1, 2, 3))(x, tuple(ws), gamma, beta)
    monkeypatch.setenv("FITHUBERT_CONV_BWD", "pallas")
    got = jax.grad(loss, argnums=(0, 1, 2, 3))(x, tuple(ws), gamma, beta)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_bwd_release_spec_bf16():
    """The real student geometry (8 layers, c0=128, bf16) through the
    kernel at its in-graph f_tile."""
    c0 = 128
    f_tile = pick_f_tile(c0, SPEC_STUDENT, itemsize=2)
    assert f_tile >= 8
    x, ws, g, _ = _make_inputs(SPEC_STUDENT, c0=c0, b=1, t=1300,
                               dtype=jnp.bfloat16, seed=5)
    _, vjp = jax.vjp(
        lambda x_, ws_: _reference_stack(x_, ws_, SPEC_STUDENT),
        x, tuple(ws))
    dx_ref, dws_ref = vjp(g)
    da0, dws = pallas_stack_bwd(x, ws, g, SPEC_STUDENT, f_tile=f_tile,
                                interpret=True)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)

    assert rel(da0[:, : x.shape[1]], dx_ref) < 5e-2
    for dw, dwr in zip(dws, dws_ref):
        assert rel(dw, dwr) < 5e-2


def test_bwd_all_k_equals_s_disjoint_windows():
    """k == s everywhere: the tile windows are disjoint (tail_len == 0) —
    the overlap-add must degrade to a plain reshape, not crash (r5 review)."""
    spec = ((32, 2, 2), (64, 2, 2))
    x, ws, g, _ = _make_inputs(spec, c0=16, t=256, seed=7)
    _, vjp = jax.vjp(
        lambda x_, ws_: _reference_stack(x_, ws_, spec), x, tuple(ws))
    dx_ref, dws_ref = vjp(g)
    da0, dws = pallas_stack_bwd(x, ws, g, spec, f_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(da0[:, : x.shape[1]]),
                               np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    for dw, dwr in zip(dws, dws_ref):
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr),
                                   rtol=1e-4, atol=1e-5)


def test_fused_gn_stack_grads_with_valid_len(monkeypatch):
    """The COMPOSED production path (GN prefix + valid_len pre-padding +
    pallas backward) vs the full XLA chain — the combination the training
    step actually runs when FITHUBERT_CONV_BWD=pallas (r5 review: GN and
    valid_len were each tested alone but never together)."""
    c0 = 16
    spec = SPEC_SMALL
    valid = 150
    t_pad = padded_input_len(valid, spec, f_tile=8)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, t_pad, c0)), jnp.float32) * 0.5
    ws, cin = [], c0
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, cin, d)) * 0.1,
                              jnp.float32))
        cin = d
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c0), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c0), jnp.float32)
    t_out = _out_len(valid, spec)
    g = jnp.asarray(rng.standard_normal((2, t_out, spec[-1][0])), jnp.float32)

    def loss(x, ws, gamma, beta):
        out = fused_conv_stack_gn(x, tuple(ws), gamma, beta, spec, 8, True,
                                  valid)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    monkeypatch.setenv("FITHUBERT_CONV_BWD", "xla")
    ref = jax.grad(loss, argnums=(0, 1, 2, 3))(x, tuple(ws), gamma, beta)
    monkeypatch.setenv("FITHUBERT_CONV_BWD", "pallas")
    got = jax.grad(loss, argnums=(0, 1, 2, 3))(x, tuple(ws), gamma, beta)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
