"""Mel front-end vs an independent torch.stft oracle (reference
modules/model.py:280-296: torchaudio MelSpectrogram 16k/400/320, center=False,
HTK mel, norm=None, power 2; log with eps 1e-15)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fithubert_tpu.ops.mel import mel_filterbank, mel_spectrogram


def test_power_spectrogram_matches_torch_stft():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.3

    # our full mel with an identity filterbank == raw power spectrogram;
    # compare framing+window+rfft against torch.stft (center=False)
    win = torch.hann_window(400, periodic=True)
    st = torch.stft(torch.from_numpy(wav), n_fft=400, hop_length=320,
                    win_length=400, window=win, center=False,
                    return_complex=True)
    want_power = (st.abs() ** 2).numpy().transpose(0, 2, 1)  # (B, T', F)

    mel = mel_spectrogram(jnp.asarray(wav), n_mels=40)
    fb = mel_filterbank(40)
    # recover: mel = power @ fb  -> verify on a few frames via lstsq-free
    # check: project the torch power through the same filterbank
    want_mel = want_power @ fb
    np.testing.assert_allclose(np.asarray(mel), want_mel, rtol=1e-4, atol=1e-4)
    assert mel.shape == (2, 1 + (4000 - 400) // 320, 40)


def test_filterbank_properties():
    fb = mel_filterbank(40)  # (201, 40)
    assert fb.shape == (201, 40)
    assert np.all(fb >= 0)
    # triangles: each filter has one peak and is unimodal-ish; total coverage
    # spans the band (interior frequencies are covered by some filter)
    assert np.all(fb.sum(axis=1)[5:-5] > 0)
    # HTK scale: filter peaks increase monotonically in frequency
    peaks = fb.argmax(axis=0)
    assert np.all(np.diff(peaks) >= 0)


def test_log_mel():
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2000)), jnp.float32)
    lin = mel_spectrogram(wav, n_mels=24, log=False)
    lg = mel_spectrogram(wav, n_mels=24, log=True)
    np.testing.assert_allclose(np.asarray(lg), np.log(np.asarray(lin) + 1e-15),
                               rtol=1e-6)
