"""shard_map + MOSAIC-compiled Pallas kernels on a real chip (VERDICT r2 #2).

Every kernels-under-mesh result before this file came from Pallas INTERPRET
mode on the CPU mesh (tests/test_pallas_mesh.py) — the combination of
jax.shard_map with kernels actually lowered by Mosaic had never compiled
anywhere, and interpret mode cannot run pltpu.prng_* at all, so in-kernel
dropout under a mesh had never executed. These tests force a 1-device
('data','model') mesh through use_kernel_mesh(force=True) so the kernel
dispatchers take their shard_map branch on the single real chip, and assert
the sharded outputs/grads match the unsharded Mosaic kernel and the XLA
oracle.

Run with: FITHUBERT_TEST_PLATFORM=tpu python -m pytest tests/test_mosaic_mesh_tpu.py -m ''
(the conftest honors the env var; default suite runs skip these on cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="needs a real TPU (Mosaic lowering)",
)

from fithubert_tpu.ops.pallas.conv_frontend import conv_stack
from fithubert_tpu.ops.pallas.flash_attention import flash_attention
from fithubert_tpu.parallel import make_mesh, use_kernel_mesh

B, T, H, D = 2, 2048, 2, 64

# fairseq teacher conv spec after block 0 (c_in = 512, 128-lane aligned as
# the non-interpret conv kernel requires)
TEACHER_TAIL = ((512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                (512, 2, 2), (512, 2, 2))


def _attn_inputs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.2
    mask = jnp.asarray(np.arange(T)[None, :] >= np.array([1800, T])[:, None])
    return q, k, v, mask


def test_flash_attention_sharded_matches_unsharded():
    """The shard_map'd Mosaic kernel must agree with the bare Mosaic kernel
    AND the XLA fallback (one fn, three lowerings)."""
    q, k, v, mask = _attn_inputs()
    bare = jax.jit(lambda: flash_attention(q, k, v, mask, force_kernel=True))()
    xla = jax.jit(lambda: flash_attention(q, k, v, mask))()  # dispatch -> XLA

    def sharded():
        with use_kernel_mesh(make_mesh(1), force=True) as mesh:
            assert mesh is not None
            return flash_attention(q, k, v, mask, force_kernel=True)

    got = jax.jit(sharded)()
    np.testing.assert_allclose(np.asarray(got), np.asarray(bare),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla),
                               atol=2e-3, rtol=2e-3)


def test_flash_attention_sharded_grads_match():
    """Custom-VJP backward kernels under shard_map: grads wrt q, k, v."""
    q, k, v, mask = _attn_inputs()

    def loss(q_, k_, v_, mesh_on):
        def inner():
            return jnp.sum(flash_attention(q_, k_, v_, mask,
                                           force_kernel=True) ** 2)

        if mesh_on:
            with use_kernel_mesh(make_mesh(1), force=True):
                return inner()
        return inner()

    g_bare = jax.jit(jax.grad(lambda a, b_, c: loss(a, b_, c, False),
                              argnums=(0, 1, 2)))(q, k, v)
    g_mesh = jax.jit(jax.grad(lambda a, b_, c: loss(a, b_, c, True),
                              argnums=(0, 1, 2)))(q, k, v)
    for gb, gm in zip(g_bare, g_mesh):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gb),
                                   atol=1e-4, rtol=1e-4)


def test_flash_attention_dropout_under_mesh():
    """In-kernel pltpu.prng_* dropout inside shard_map — the one path
    interpret mode can never execute. On a 1-device mesh the shard seed
    offset is zero, so sharded and unsharded streams must agree exactly."""
    q, k, v, mask = _attn_inputs()
    seed = jnp.asarray([7], jnp.int32)

    def run(mesh_on, s):
        def inner():
            return flash_attention(q, k, v, mask, dropout_p=0.1,
                                   dropout_seed=s, force_kernel=True)

        if mesh_on:
            with use_kernel_mesh(make_mesh(1), force=True):
                return inner()
        return inner()

    f_mesh = jax.jit(lambda s: run(True, s))
    f_bare = jax.jit(lambda s: run(False, s))
    out = f_mesh(seed)
    assert bool(jnp.all(out == f_mesh(seed)))  # deterministic per seed
    assert bool(jnp.any(out != f_mesh(jnp.asarray([8], jnp.int32))))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(f_bare(seed)))


def test_conv_stack_sharded_matches_unsharded():
    """Fused conv front-end under shard_map vs bare Mosaic vs XLA oracle."""
    from fithubert_tpu.ops.pallas.conv_frontend import _reference_stack

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 1500, 512)) * 0.3, jnp.float32)
    ws = []
    c_in = 512
    for (d, k, _s) in TEACHER_TAIL:
        ws.append(jnp.asarray(rng.standard_normal((k, c_in, d)) * 0.05,
                              jnp.float32))
        c_in = d
    ws = tuple(ws)

    bare = jax.jit(lambda: conv_stack(x, ws, TEACHER_TAIL))()

    def sharded():
        with use_kernel_mesh(make_mesh(1), force=True):
            return conv_stack(x, ws, TEACHER_TAIL)

    got = jax.jit(sharded)()
    oracle = jax.jit(lambda: _reference_stack(x, list(ws), TEACHER_TAIL))()
    np.testing.assert_allclose(np.asarray(got), np.asarray(bare),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               atol=2e-3, rtol=2e-3)


def test_conv_stack_sharded_grads_match():
    rng = np.random.default_rng(2)
    spec = TEACHER_TAIL[:3]
    x = jnp.asarray(rng.standard_normal((2, 800, 512)) * 0.3, jnp.float32)
    ws = []
    c_in = 512
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, c_in, d)) * 0.05,
                              jnp.float32))
        c_in = d
    ws = tuple(ws)

    def loss(x_, mesh_on):
        def inner():
            return jnp.sum(conv_stack(x_, ws, spec) ** 2)

        if mesh_on:
            with use_kernel_mesh(make_mesh(1), force=True):
                return inner()
        return inner()

    g_bare = jax.jit(jax.grad(lambda a: loss(a, False)))(x)
    g_mesh = jax.jit(jax.grad(lambda a: loss(a, True)))(x)
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_bare),
                               atol=1e-4, rtol=1e-4)
