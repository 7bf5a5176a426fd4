"""Seeded elementwise dropout (Pallas TPU) whose backward REGENERATES the
keep-mask from the seed instead of storing it.

Why this exists: at FitHuBERT shapes the attention-prob dropout is ~17x the
cost of the attention math itself (measured on a v5e: B=12, T=320, H=12,
d_head=40 fwd+bwd is 0.07 ms without dropout, 1.25 ms with the
bernoulli+where XLA path — the reference applies dropout to the softmax probs,
reference modules/module.py:498-504 via fairseq MultiheadAttention's
`dropout_module`). The XLA path pays for (a) generating 32 random bits per
prob element, (b) materializing the keep-mask to HBM so autodiff can replay
it, and (c) the fusion break the RNG threading causes around the softmax.

This kernel makes dropout O(bytes-of-x): forward reads x and writes
`where(keep, x/(1-p), 0)` with `keep` generated in VMEM from the hardware PRNG
(`pltpu.prng_*`, seeded per grid block); the custom VJP applies the SAME
kernel to the cotangent — dropout's Jacobian is the diagonal mask, and the
per-block seeding makes regeneration exact — so nothing is saved between
passes and XLA never sees an RNG data dependency.

Same 24-bit threshold scheme as the flash-attention kernel's in-kernel
dropout (flash_attention._keep_mask); interpret mode cannot run pltpu.prng_*
(CLAUDE.md), so off-TPU falls back to a differentiable bernoulli path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

# Rows per grid block of the flattened (rows, lanes) view. At the largest
# lane dim this model produces in the release configs (attention probs,
# N = T up to ~1792) a 512-row block costs ~3.6 MB of int32 random bits +
# ~2 MB of x/out + fp32 intermediates — inside the 16 MB VMEM budget with
# margin. For wider rows (flash_attention's XLA path accepts any shape
# whose logits fit HBM) the block shrinks to stay under budget.
_BLOCK_ROWS = 512
_VMEM_BUDGET_BYTES = 12_000_000


def _pick_block_rows(n: int, itemsize: int) -> int:
    """Largest multiple-of-8 row count <= _BLOCK_ROWS whose per-block VMEM
    (int32 random bits + fp32 scaled intermediate + in/out at itemsize)
    fits the budget."""
    per_row = n * (4 + 4 + 2 * itemsize)
    rows = min(_BLOCK_ROWS, max(8, (_VMEM_BUDGET_BYTES // per_row) // 8 * 8))
    return rows


def _make_kernel(dropout_p: float):
    thr = min(int(dropout_p * (1 << 24)), (1 << 24) - 1)
    inv = 1.0 / (1.0 - dropout_p)

    def _kernel(seed_ref, x_ref, o_ref):
        # prng_seed MIXES its operands (not adds): both 32-bit key words give
        # distinct per-site streams (a plain seed+block_id sum made seed s
        # block i collide with seed s+1 block i-1 — ADVICE r3). The block id
        # XORs into the second word because Mosaic rejects prng_seed with
        # more than 2 operands (measured on v5e); cross-key aliasing then
        # needs an exact first-word match (2^-32).
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        bits24 = jax.lax.shift_right_logical(bits, jnp.uint32(8)).astype(jnp.int32)
        keep = bits24 >= thr
        scaled = x_ref[...].astype(jnp.float32) * inv
        o_ref[...] = jnp.where(keep, scaled, 0.0).astype(o_ref.dtype)

    return _kernel


def _run(x2d, seed, dropout_p: float, interpret: bool):
    m, n = x2d.shape
    # fixed block rows with a masked tail block: Pallas clips out-of-bounds
    # stores on the last block, and fwd/bwd share the same grid + per-block
    # seeds, so regeneration stays exact for any M (the fithubert step
    # produces M = B*H*T_q = 43200, divisible by none of the pow-2 blocks)
    bm = min(m, _pick_block_rows(n, x2d.dtype.itemsize))
    grid = (pl.cdiv(m, bm),)
    return pl.pallas_call(
        _make_kernel(dropout_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        interpret=interpret,
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _core(x2d, seed, dropout_p: float, interpret: bool):
    return _run(x2d, seed, dropout_p, interpret)


def _core_fwd(x2d, seed, dropout_p, interpret):
    return _run(x2d, seed, dropout_p, interpret), seed


def _core_bwd(dropout_p, interpret, seed, g):
    # dropout is a diagonal Jacobian: dx = g * mask/(1-p) — same kernel, same
    # seed, same grid (g has x's shape), so the regenerated mask is identical
    return _run(g, seed, dropout_p, interpret), None


_core.defvjp(_core_fwd, _core_bwd)


def _seed2(seed: jnp.ndarray) -> jnp.ndarray:
    """Normalize a caller seed to the (2,) int32 the kernel consumes.

    Callers with a full RNG key pass both 32-bit words (module_prob_dropout);
    legacy (1,)/scalar seeds are zero-padded — a 31-bit space collides across
    distinct dropout sites at ~n^2/2^31 per step (ADVICE r3), so new call
    sites should always pass two words."""
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.shape[0] == 1:
        seed = jnp.concatenate([seed, jnp.zeros((1,), jnp.int32)])
    return seed[:2]


def _bernoulli_fallback(x, seed, dropout_p):
    """Differentiable off-TPU path (autodiff stores the mask — fine on CPU)."""
    seed = _seed2(seed)
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(0), seed[0]), seed[1]
    )
    keep = jax.random.bernoulli(key, 1.0 - dropout_p, x.shape)
    return jnp.where(keep, x, 0.0) / jnp.asarray(1.0 - dropout_p, x.dtype)


_warned_fallback = False


def _warn_sharded_fallback(reason: str) -> None:
    """LOUD one-time notice when the TPU kernel path is skipped under a
    kernel mesh: the bernoulli+where path it degrades to costs ~4x the
    attention math it regularizes (the 10.65 -> 11.8 steps/s win), so a
    silent fallback could quietly lose it on a config change (ADVICE r3)."""
    global _warned_fallback
    if not _warned_fallback:
        _warned_fallback = True
        print(f"[seeded_dropout] WARNING: sharded TPU kernel path skipped "
              f"({reason}); using the ~4x-cost bernoulli fallback", flush=True)


def seeded_dropout(
    x: jnp.ndarray,
    seed: jnp.ndarray,  # (1,) int32
    dropout_p: float,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dropout with mask-regenerating backward. `x` is any array whose leading
    axis is the (data-sharded) batch axis; kernels shard_map themselves over
    an active kernel mesh exactly like flash_attention does (GSPMD cannot
    partition a pallas_call)."""
    from fithubert_tpu.ops.pallas import interpret_forced

    if dropout_p <= 0.0:
        return x
    interpret = interpret or interpret_forced()
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu or interpret:
        # interpret mode cannot execute pltpu.prng_* at all (CLAUDE.md) —
        # the bernoulli path is the only off-TPU option
        return _bernoulli_fallback(x, seed, dropout_p)

    seed = _seed2(seed)
    shape = x.shape
    n = shape[-1] if x.ndim >= 2 else x.size
    flat = lambda a: a.reshape(-1, n)
    unflat = lambda a: a.reshape(shape)

    from fithubert_tpu.parallel import current_kernel_mesh

    mesh = current_kernel_mesh()
    if mesh is not None:
        n_data = mesh.shape.get("data", 1)
        if x.ndim < 2 or shape[0] % n_data != 0:
            _warn_sharded_fallback(
                f"x.shape={shape} not divisible by data axis {n_data}")
            return _bernoulli_fallback(x, seed, dropout_p)

        def _sharded(xs, seeds):
            # decorrelate blocks across shards (same grid indices everywhere)
            idx = jax.lax.axis_index("data").astype(jnp.int32)
            seeds = seeds + idx * jnp.int32(2654435761 & 0x7FFFFFFF)
            return unflat_s(_core(flat(xs), seeds, float(dropout_p), interpret))

        # per-shard unflatten uses the per-shard leading dim
        def unflat_s(a):
            return a.reshape((shape[0] // n_data,) + shape[1:])

        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.shard_map(
            _sharded,
            mesh=mesh,
            in_specs=(spec, P()),
            out_specs=spec,
            check_vma=False,
        )(x, seed)

    return unflat(_core(flat(x), seed, float(dropout_p), interpret))


def module_prob_dropout(module, probs, rate: float, deterministic: bool):
    """Attention-prob dropout for flax modules: derives a (1,) int32 seed from
    the module's 'dropout' RNG stream and applies seeded_dropout. Keeps
    nn.Dropout's contract of not touching make_rng when rate == 0."""
    if deterministic or rate <= 0.0:
        return probs
    # full 64 bits of seed material (implementation-independent across
    # threefry/rbg keys): two uint32 words bitcast to the kernel's int32
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(module.make_rng("dropout"), (2,), jnp.uint32),
        jnp.int32,
    )
    return seeded_dropout(probs, seed, rate)
