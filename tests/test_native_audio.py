"""native/libaudioio.so: FLAC + WAV decode and the threaded batch loader.

The decoder replaces the reference's torchaudio/libsox flac path
(reference utils/dataset.py:59-61). Golden data comes from tests/flac_writer.py,
a minimal spec-conformant encoder, so every subframe type and stereo mode is
exercised bit-exactly.
"""

import ctypes
import os

import numpy as np
import pytest

from tests.flac_writer import write_flac, write_wav

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native", "build", "libaudioio.so")


def _lib_available() -> bool:
    from fithubert_tpu.data import audio

    return audio._load_native() is not None  # auto-builds on first use


pytestmark = pytest.mark.skipif(
    not _lib_available(), reason="native lib not built (make -C native failed)"
)


def _decode(path):
    from fithubert_tpu.data import audio

    audio._NATIVE = None
    audio._NATIVE_TRIED = False
    return audio.decode(path)


def _sig(n, seed=0, scale=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = scale * np.sin(2 * np.pi * 220 * t / 16000) + rng.normal(0, 50, n)
    return np.round(x).astype(np.int64)


@pytest.mark.parametrize("kind", ["verbatim", "constant", "fixed0", "fixed1",
                                  "fixed2", "lpc"])
def test_flac_mono_roundtrip(tmp_path, kind):
    n = 10000
    x = np.full(n, 123, np.int64) if kind == "constant" else _sig(n)
    path = str(tmp_path / f"{kind}.flac")
    write_flac(path, [x], kind=kind)
    got = _decode(path)
    assert got.shape == (n,)
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)


@pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
def test_flac_stereo_modes(tmp_path, mode):
    n = 5000
    l, r = _sig(n, 1), _sig(n, 2)
    path = str(tmp_path / f"{mode}.flac")
    write_flac(path, [l, r], kind="verbatim", stereo_mode=mode)
    got = _decode(path)
    want = (l + r) / 2.0 / 32768.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_flac_multiframe(tmp_path):
    n = 10000  # 3 frames at blocksize 4096
    x = _sig(n, 3)
    path = str(tmp_path / "mf.flac")
    write_flac(path, [x], kind="fixed1", blocksize=4096)
    got = _decode(path)
    assert got.shape == (n,)
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)


def test_wav_roundtrip(tmp_path):
    x = _sig(4000, 4)
    path = str(tmp_path / "a.wav")
    write_wav(path, x)
    got = _decode(path)
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-4)


def test_batch_loader(tmp_path):
    lib = ctypes.CDLL(LIB)
    lib.audioio_load_batch.restype = ctypes.c_int
    lib.audioio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
    ]
    sigs = [_sig(3000 + 500 * i, seed=i) for i in range(4)]
    paths = []
    for i, s in enumerate(sigs):
        p = str(tmp_path / f"b{i}.flac")
        write_flac(p, [s], kind="fixed2")
        paths.append(p)

    t_pad = 6000
    out = np.zeros((4, t_pad), np.float32)
    lengths = np.zeros(4, np.int64)
    arr = (ctypes.c_char_p * 4)(*[p.encode() for p in paths])
    rc = lib.audioio_load_batch(
        arr, 4, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_pad, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), 2,
    )
    assert rc == 0
    for i, s in enumerate(sigs):
        assert lengths[i] == len(s)
        np.testing.assert_allclose(out[i, : len(s)], s / 32768.0, atol=1e-7)
        assert np.all(out[i, len(s):] == 0)


def test_batch_loader_missing_file(tmp_path):
    lib = ctypes.CDLL(LIB)
    lib.audioio_load_batch.restype = ctypes.c_int
    lib.audioio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
    ]
    out = np.zeros((1, 100), np.float32)
    lengths = np.zeros(1, np.int64)
    arr = (ctypes.c_char_p * 1)(str(tmp_path / "nope.flac").encode())
    rc = lib.audioio_load_batch(
        arr, 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        100, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), 1,
    )
    assert rc == -1
    assert lengths[0] == 0
