"""Mel-spectrogram front-end in pure JAX.

Matches torchaudio.transforms.MelSpectrogram(sample_rate=16000, n_fft=400,
hop_length=320, center=False, power=2.0, window=hann, mel_scale='htk',
norm=None) as configured at reference modules/model.py:280-286. The framing +
rfft + filterbank matmul all lower to XLA-fused ops; the filterbank matmul
runs on the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int, n_fft: int = 400, sample_rate: int = 16000,
    f_min: float = 0.0, f_max: float | None = None,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank, norm=None (torchaudio default)."""
    f_max = f_max or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(np.array(f_min)), _hz_to_mel_htk(np.array(f_max)), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    wav: jnp.ndarray,  # (B, T)
    n_mels: int,
    n_fft: int = 400,
    hop_length: int = 320,
    sample_rate: int = 16000,
    log: bool = False,
) -> jnp.ndarray:
    """Returns (B, T', n_mels) power mel features; T' = 1 + (T - n_fft)//hop."""
    b, t = wav.shape
    num_frames = 1 + (t - n_fft) // hop_length
    # frame: gather strided windows — as_strided-equivalent via reshape+slice
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(num_frames)[:, None]
    frames = wav[:, idx]  # (B, F, n_fft)
    # periodic hann (torch.hann_window default)
    window = 0.5 * (1.0 - np.cos(2.0 * math.pi * np.arange(n_fft) / n_fft))
    frames = frames * jnp.asarray(window, dtype=wav.dtype)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2  # (B, F, n_freqs)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("bfk,km->bfm", power, fb, preferred_element_type=jnp.float32)
    if log:
        mel = jnp.log(mel + 1e-15)
    return mel
