"""SpecAugment vs the reference's espnet semantics (utils/specaug.py).

The reference applies per-sample python loops with torch.randint; ours is
jit-able mask arithmetic, so parity is structural/statistical rather than
RNG-exact: band shapes, counts, width bounds, the exclusive batch-max
position bound, the adaptive clamps, and the mean-fill mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.config import SpecAugConfig
from fithubert_tpu.ops.specaug import _mask_along_axis, spec_augment

B, T, D = 3, 200, 80


def _spec(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, D)) + 5.0, jnp.float32)


def _bands(mask_1d):
    """Contiguous True runs of a 1-D boolean array as (start, length)."""
    runs, start = [], None
    for i, v in enumerate(mask_1d):
        if v and start is None:
            start = i
        if not v and start is not None:
            runs.append((start, i - start))
            start = None
    if start is not None:
        runs.append((start, len(mask_1d) - start))
    return runs


def test_freq_mask_band_structure():
    """Freq masks are <= num_mask full-time bands of width < hi (reference
    utils/specaug.py:240-246: torch.randint(lo, T) is hi-exclusive)."""
    x = _spec()
    lo, hi, n = 0, 15, 2
    for seed in range(20):
        out = _mask_along_axis(
            jax.random.PRNGKey(seed), x, D, 2, (lo, hi), n,
            replace_with_zero=True,
        )
        masked = np.asarray(out == 0.0)  # x is nowhere 0.0 (offset +5)
        for b in range(B):
            cols = masked[b].all(axis=0)  # full-time extent per band
            assert np.array_equal(masked[b].any(axis=0), cols)
            runs = _bands(cols)
            assert len(runs) <= n
            # bands can merge; total width <= n * (hi - 1)
            assert sum(w for _s, w in runs) <= n * (hi - 1)


def test_position_bound_is_batch_max_exclusive():
    """Positions are uniform over [0, max(1, L - mask_len.max())) — ONE
    bound shared across the batch, exclusive (reference
    utils/specaug.py:249-252). With a fixed width w that means the last
    w columns past index L - w - 1 + w = L - 1 are reachable only up to
    end L - 1: the final column is NEVER masked."""
    x = _spec()
    w = 10  # randint(10, 11) -> always 10
    hits_last, hits_tail = 0, 0
    for seed in range(200):
        out = _mask_along_axis(
            jax.random.PRNGKey(seed), x, D, 2, (w, w + 1), 1,
            replace_with_zero=True,
        )
        masked = np.asarray(out == 0.0).all(axis=1)  # (B, D)
        assert masked.sum(axis=1).tolist() == [w] * B  # exactly one w-band
        hits_last += int(masked[:, -1].any())
        hits_tail += int(masked[:, -2].any())
    assert hits_last == 0  # exclusive bound: pos <= D - w - 1 -> end <= D - 2
    assert hits_tail > 0  # but the bound is tight: D - 2 is reachable


def test_adaptive_time_mask_clamps():
    """adaptive=True on the time axis: num_mask becomes
    min(int(ratio * T), max_n) and widths clamp to int(size_ratio * T)
    (reference utils/specaug.py:247-252 'Adaptive_SpecAugment')."""
    x = _spec()
    t = x.shape[1]  # 200 -> n = min(int(0.04*200), 20) = 8, hi = 8
    out = _mask_along_axis(
        jax.random.PRNGKey(3), x, t, 1, (0, 100), 2,
        replace_with_zero=True, adaptive=True,
        adaptive_number_ratio=0.04, adaptive_size_ratio=0.04,
        max_n_time_masks=20,
    )
    masked = np.asarray(out == 0.0).all(axis=2)  # (B, T) full-freq rows
    for b in range(B):
        runs = _bands(masked[b])
        # more bands than the nominal num_mask=2 can appear (n=8)...
        assert len(runs) <= 8
        # ...but each band is clamped to the adaptive width bound. Bands can
        # merge, so bound the largest by n * (hi - 1) only in aggregate:
        assert sum(w for _s, w in runs) <= 8 * 7


def test_replace_with_mean():
    """replace_with_zero=False fills with the GLOBAL tensor mean, padded
    rows included (reference utils/specaug.py:268-271 spec.mean())."""
    x = _spec()
    w = 12
    out = _mask_along_axis(
        jax.random.PRNGKey(5), x, D, 2, (w, w + 1), 1,
        replace_with_zero=False,
    )
    mean = float(jnp.mean(x))
    vals = np.asarray(out)
    filled = np.isclose(vals, mean, atol=1e-5) & ~np.isclose(
        np.asarray(x), mean, atol=1e-5)
    # one w-wide full-time band per sample got the mean value
    assert filled.all(axis=1).sum(axis=-1).tolist() == [w] * B


def test_spec_augment_end_to_end_and_length_zeroing():
    cfg = SpecAugConfig(apply_time_warp=True, time_warp_window=5)
    x = _spec()
    lengths = jnp.asarray([200, 150, 100])
    out = spec_augment(jax.random.PRNGKey(7), x, cfg, lengths=lengths)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # rows past each sample's length are zeroed
    o = np.asarray(out)
    assert np.all(o[1, 150:] == 0.0)
    assert np.all(o[2, 100:] == 0.0)
    # augmentation actually changed the valid region
    assert not np.allclose(o[0], np.asarray(x[0]))


def test_disabled_transforms_are_identity():
    cfg = SpecAugConfig(apply_time_warp=False, apply_freq_mask=False,
                        apply_time_mask=False)
    x = _spec()
    out = spec_augment(jax.random.PRNGKey(11), x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
