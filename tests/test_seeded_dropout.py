"""Seeded mask-regenerating dropout (ops/pallas/dropout.py).

CPU tests exercise the differentiable bernoulli fallback and the flax-module
wiring; the pltpu.prng_* kernel itself has no CPU lowering (CLAUDE.md), so the
kernel invariants — determinism, drop-rate, and the critical forward/backward
mask IDENTITY under regeneration — live in the TPU-gated class below
(validated on a v5e; run with FITHUBERT_TEST_PLATFORM=tpu).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.ops.pallas.dropout import module_prob_dropout, seeded_dropout

SEED = jnp.asarray([7], jnp.int32)


def _x(shape, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    # strictly nonzero so out != 0 identifies the keep-mask exactly
    return jnp.asarray(rng.uniform(0.5, 1.5, shape), dtype)


def _check_semantics(x, p):
    """out is elementwise either 0 or x/(1-p); drop rate is ~p; the gradient
    reapplies the SAME mask (regenerated on TPU, replayed by autodiff on CPU)."""
    f = jax.jit(lambda x_: seeded_dropout(x_, SEED, p))
    out = f(x)
    kept = np.asarray(out) != 0.0
    np.testing.assert_allclose(
        np.asarray(out)[kept],
        np.asarray(x, np.float32)[kept] / (1.0 - p),
        rtol=2e-2,
    )
    rate = 1.0 - kept.mean()
    assert abs(rate - p) < 0.02, rate

    w = _x(x.shape) + 1.0  # distinct weights so the mask must be elementwise
    g = jax.jit(jax.grad(lambda x_: jnp.sum(seeded_dropout(x_, SEED, p)
                                            .astype(jnp.float32) * w)))(x)
    expected = np.where(kept, np.asarray(w) / (1.0 - p), 0.0)
    np.testing.assert_allclose(np.asarray(g, np.float32), expected, rtol=2e-2)


def test_p_zero_is_identity():
    x = _x((4, 16))
    assert seeded_dropout(x, SEED, 0.0) is x


def test_fallback_semantics_cpu():
    _check_semantics(_x((48, 320)), 0.1)


def test_deterministic_and_seed_sensitive():
    x = _x((32, 128))
    f = jax.jit(lambda s: seeded_dropout(x, s, 0.2))
    assert bool(jnp.all(f(SEED) == f(SEED)))
    assert bool(jnp.any(f(SEED) != f(jnp.asarray([8], jnp.int32))))


class _ProbModule(nn.Module):
    rate: float = 0.25

    @nn.compact
    def __call__(self, probs, deterministic=True):
        return module_prob_dropout(self, probs, self.rate, deterministic)


def test_module_wiring():
    m = _ProbModule()
    x = _x((2, 4, 16, 16))
    # deterministic / rate=0: identity AND no 'dropout' rng requested
    out = m.apply({}, x, deterministic=True)
    assert out is x
    out = _ProbModule(rate=0.0).apply({}, x, deterministic=False)
    assert out is x
    # training: needs the stream, applies the mask
    out = m.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    kept = np.asarray(out) != 0.0
    assert 0.6 < kept.mean() < 0.9
    np.testing.assert_allclose(
        np.asarray(out)[kept], np.asarray(x)[kept] / 0.75, rtol=1e-5
    )


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a real TPU (pltpu prng)"
)
class TestKernelOnTPU:
    def test_kernel_semantics_divisible_rows(self):
        # M = 48*320 divisible by 512 — the fast-path block shape
        _check_semantics(_x((48, 320, 320), jnp.bfloat16), 0.1)

    def test_kernel_semantics_odd_rows(self):
        # M = 12*320*320/320 = 3840, not a multiple of 512 -> exercises the
        # masked tail block (grid = cdiv(M, 512))
        _check_semantics(_x((12, 320, 320), jnp.bfloat16), 0.1)

    def test_kernel_under_kernel_mesh(self):
        """shard_map path: 1-device forced mesh, per-shard seeds."""
        from fithubert_tpu.parallel import make_mesh, use_kernel_mesh

        x = _x((8, 64, 320), jnp.bfloat16)
        mesh = make_mesh(1)

        def f(x_):
            with use_kernel_mesh(mesh, force=True):
                return seeded_dropout(x_, SEED, 0.1)

        out = jax.jit(f)(x)
        kept = np.asarray(out) != 0.0
        assert abs((1.0 - kept.mean()) - 0.1) < 0.02
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[kept],
            np.asarray(x, np.float32)[kept] / 0.9,
            rtol=2e-2,
        )


def test_block_rows_respect_vmem_budget():
    """Row blocks shrink with the lane count so bits+intermediates+in/out
    stay under the scoped-VMEM budget at any width flash_attention's XLA
    path can produce."""
    from fithubert_tpu.ops.pallas.dropout import (
        _BLOCK_ROWS, _VMEM_BUDGET_BYTES, _pick_block_rows,
    )

    for n in (256, 480, 1792, 4096, 8192, 16384):
        for itemsize in (2, 4):
            rows = _pick_block_rows(n, itemsize)
            assert rows % 8 == 0 or rows == 8
            assert rows <= _BLOCK_ROWS
            per_block = rows * n * (4 + 4 + 2 * itemsize)
            assert per_block <= max(
                _VMEM_BUDGET_BYTES,
                8 * n * (4 + 4 + 2 * itemsize),  # floor: 8 rows minimum
            )
    # the release attention shape keeps its measured 512-row block
    assert _pick_block_rows(1792, 2) == 512
