"""Padding-mask machinery.

Masks use the reference convention: ``True`` marks a PADDING position
(reference utils/dataset.py:68-71). All functions are shape-static and
jit-safe; none contain data-dependent Python control flow.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def conv_out_length(length, kernel: int, stride: int):
    """floor((L - k)/s + 1) — reference modules/model.py:381-382."""
    return (length - kernel) // stride + 1


def feat_extract_output_lengths(lengths, conv_layers: Sequence[Tuple[int, int, int]]):
    """Apply the conv length formula over a full extractor spec.

    Mirrors reference modules/model.py:376-391 (`_get_feat_extract_output_lengths`).
    Works on Python ints and jnp arrays alike.
    """
    for (_, k, s) in conv_layers:
        lengths = conv_out_length(lengths, k, s)
    return lengths


def lengths_to_padding_mask(lengths, max_len: int):
    """Boolean (B, max_len) mask with True at padded positions t >= length.

    Equivalent to the reference's flip/cumsum construction
    (reference modules/model.py:457-470) which resolves to `t >= out_len`.
    """
    positions = jnp.arange(max_len)[None, :]
    return positions >= jnp.asarray(lengths)[:, None]


def padding_mask_to_lengths(mask):
    """(B, T) bool padding mask -> (B,) int32 valid lengths."""
    return jnp.sum(jnp.logical_not(mask), axis=-1).astype(jnp.int32)


def reduce_padding_mask(mask, factor: int, ceil: bool = False):
    """Time-reduce a padding mask for a TR layer of stride `factor`.

    Reference semantics (modules/module.py:312-316,324-328): chunk time into
    groups of `factor` (dropping a trailing partial chunk) and mark a reduced
    position as padding if ANY source position in its chunk is padding.

    ceil=True keeps the trailing partial chunk (reduced over its REAL
    positions only) — required for the fc1/fc2 TR types, whose
    concat_channelwise zero-PADS x up to ceil(t/factor) frames
    (modules/module.py:360-370) while the reference still floor-reduces the
    mask: at odd T the reference hands MultiheadAttention a mask one frame
    shorter than x and crashes (one more way the fc TR types cannot run
    there, SURVEY §4 — they work here, so the mask must match x)."""
    if mask is None:
        return None
    b, t = mask.shape
    if ceil and t % factor:
        # pad with False (= real) so any() sees only the REAL tail
        # positions: the tail frame is padding iff ANY real source position
        # in it is padding — the same any() semantics as the full chunks
        pad = factor - t % factor
        mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=False)
        t = mask.shape[1]
    t_out = t // factor
    return jnp.any(mask[:, : t_out * factor].reshape(b, t_out, factor), axis=-1)


def pad_to_multiple(x, multiple: int, axis: int = -1, value=0):
    """Pad `axis` of `x` up to a multiple of `multiple` (reference modules/module.py:105-116).

    Returns (padded, remainder). Static-shape: `x.shape` must be concrete.
    """
    if x is None:
        return None, 0
    if multiple <= 1:
        return x, 0
    tsz = x.shape[axis]
    remainder = math.ceil(tsz / multiple) * multiple - tsz
    if remainder == 0:
        return x, 0
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, remainder)
    return jnp.pad(x, pad_width, constant_values=value), remainder


def apply_padding_mask(x, padding_mask: Optional[jnp.ndarray], value=0.0):
    """Zero (or fill) features at padded positions: x is (B, T, C), mask (B, T).

    Equivalent of fairseq `index_put(x, padding_mask, 0)` used at
    reference modules/module.py:274.
    """
    if padding_mask is None:
        return x
    return jnp.where(padding_mask[..., None], jnp.asarray(value, dtype=x.dtype), x)
