"""SpecAugment as pure, vmappable mask arithmetic on padded batches.

Reference utils/specaug.py:27-292 (espnet-derived) uses per-sample python
loops, torch.randint, and masked_fill_. Here each transform is expressed as
static-shape mask arithmetic driven by an explicit PRNG key, so the whole
augmentation jits into the train step. Time warp (an interpolation the
reference disables in every shipped config: apply_time_warp=False) is
implemented with a piecewise-linear resample grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fithubert_tpu.config import SpecAugConfig


def _mask_along_axis(
    key: jax.Array,
    spec: jnp.ndarray,  # (B, T, D)
    axis_len: int,
    axis: int,  # 1 = time, 2 = freq
    width_range: Tuple[int, int],
    num_mask: int,
    replace_with_zero: bool,
    adaptive: bool = False,
    adaptive_number_ratio: float = 0.04,
    adaptive_size_ratio: float = 0.04,
    max_n_time_masks: int = 20,
) -> jnp.ndarray:
    """One MaskAlongAxis application (reference utils/specaug.py:225-281)."""
    b = spec.shape[0]
    lo, hi = width_range
    n = num_mask
    if adaptive and axis == 1:
        if adaptive_number_ratio > 0:
            n = min(int(adaptive_number_ratio * axis_len), max_n_time_masks)
        if adaptive_size_ratio > 0:
            hi = min(hi, int(adaptive_size_ratio * axis_len))
    if n <= 0:
        return spec
    hi = max(hi, lo + 1)
    k_len, k_pos = jax.random.split(key)
    mask_len = jax.random.randint(k_len, (b, n, 1), lo, hi)
    # positions are uniform over [0, max(1, L - mask_len.max())) — ONE bound
    # shared by the whole batch, set by the largest drawn width (espnet
    # semantics, reference utils/specaug.py:249-252: torch.randint(0,
    # max(1, D - mask_length.max()), ...)); the bound is traced, so draw
    # uniform floats and floor-scale instead of randint
    bound = jnp.maximum(1, axis_len - jnp.max(mask_len)).astype(jnp.float32)
    u = jax.random.uniform(k_pos, (b, n, 1))
    mask_pos = jnp.floor(u * bound).astype(jnp.int32)
    aran = jnp.arange(axis_len)[None, None, :]
    mask = (mask_pos <= aran) & (aran < mask_pos + mask_len)  # (B, n, L)
    mask = jnp.any(mask, axis=1)  # (B, L)
    mask = mask[:, :, None] if axis == 1 else mask[:, None, :]
    value = jnp.asarray(0.0, spec.dtype) if replace_with_zero else jnp.mean(spec)
    return jnp.where(mask, value, spec)


def _time_warp(key: jax.Array, spec: jnp.ndarray, window: int) -> jnp.ndarray:
    """Piecewise-linear time warp (reference utils/specaug.py:115-158).

    Picks a center c in [window, T-window) and a warped position w near it,
    then linearly resamples [0, c) -> [0, w) and [c, T) -> [w, T).
    """
    b, t, d = spec.shape
    if t - window <= window:
        return spec
    kc, kw = jax.random.split(key)
    center = jax.random.randint(kc, (b,), window, t - window)
    warped = jax.random.randint(kw, (b,), -window, window) + center + 1
    warped = jnp.clip(warped, 1, t - 1)

    out_pos = jnp.arange(t)[None, :].astype(jnp.float32)  # (B, T)
    c = center[:, None].astype(jnp.float32)
    w = warped[:, None].astype(jnp.float32)
    left = out_pos * (c / w)
    right = c + (out_pos - w) * (t - c) / (t - w)
    src = jnp.where(out_pos < w, left, right)
    src = jnp.clip(src, 0.0, t - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo)[..., None]
    gather = jax.vmap(lambda s, i: s[i])
    return gather(spec, lo) * (1 - frac) + gather(spec, hi) * frac


def spec_augment(
    key: jax.Array,
    spec: jnp.ndarray,  # (B, T, D) mel features
    cfg: SpecAugConfig,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    k_warp, k_freq, k_time = jax.random.split(key, 3)
    t, d = spec.shape[1], spec.shape[2]
    if cfg.apply_time_warp:
        spec = _time_warp(k_warp, spec, cfg.time_warp_window)
    if cfg.apply_freq_mask:
        spec = _mask_along_axis(
            k_freq, spec, d, 2, tuple(cfg.freq_mask_width_range), cfg.num_freq_mask,
            cfg.replace_with_zero,
        )
    if cfg.apply_time_mask:
        spec = _mask_along_axis(
            k_time, spec, t, 1, tuple(cfg.time_mask_width_range), cfg.num_time_mask,
            cfg.replace_with_zero, cfg.adaptive, cfg.adaptive_number_ratio,
            cfg.adaptive_size_ratio, cfg.max_n_time_masks,
        )
    if lengths is not None:
        valid = jnp.arange(t)[None, :] < lengths[:, None]
        spec = jnp.where(valid[..., None], spec, 0.0)
    return spec
