"""Host-side audio decoding with pluggable backends.

The reference decodes flac via torchaudio/libsox (reference utils/dataset.py:
59-61). This environment ships neither; decode order here:

  1. native C++ decoder (native/libaudioio.so, FLAC + WAV, via ctypes) — the
     framework's native data-loader component
  2. soundfile, if importable
  3. scipy.io.wavfile for .wav
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False
_NATIVE_LOCK = threading.Lock()


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    # serialized: decode_batch runs on a thread pool, and a loser racing the
    # first load would see TRIED=True with the lib still None and silently
    # fall back to the (possibly absent) python decoder
    with _NATIVE_LOCK:
        return _load_native_locked()


def _load_native_locked():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build = os.path.join(here, "native", "build", "libaudioio.so")
    if not os.path.exists(build) and os.path.exists(
        os.path.join(here, "native", "audioio.cc")
    ):
        # build artifacts are not checked in; compile once on first use (this
        # is the only FLAC decoder in environments without soundfile). The
        # threading.Lock above serializes threads in THIS process; an fcntl
        # file lock serializes concurrent PROCESSES (multi-host launches,
        # parallel CLIs) that would otherwise race writes to the .so.
        import subprocess

        try:
            import fcntl

            lock_path = os.path.join(here, "native", ".build.lock")
            with open(lock_path, "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    if not os.path.exists(build):  # a peer may have built it
                        subprocess.run(
                            ["make", "-C", os.path.join(here, "native")],
                            check=True, capture_output=True, timeout=120,
                        )
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)
        except Exception as e:
            # fall through to the python backends, but say so: a silent
            # build failure once looked like "all decodes are zero"
            print(f"[audio] native decoder build failed ({e!r}); "
                  f"using python fallbacks")
    for cand in (
        build,
        os.path.join(here, "native", "libaudioio.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.audioio_decode.restype = ctypes.c_longlong
            lib.audioio_decode.argtypes = [
                ctypes.c_char_p,            # path
                ctypes.POINTER(ctypes.c_float),  # out buffer (or NULL to query)
                ctypes.c_longlong,          # buffer capacity (samples)
                ctypes.POINTER(ctypes.c_int),    # out sample rate
            ]
            lib.audioio_load_batch.restype = ctypes.c_int
            lib.audioio_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),  # paths
                ctypes.c_int,                     # n files
                ctypes.POINTER(ctypes.c_float),   # out (n, t_pad)
                ctypes.c_longlong,                # t_pad
                ctypes.POINTER(ctypes.c_longlong),  # out lengths
                ctypes.c_int,                     # n_threads (0 = hw)
            ]
            _NATIVE = lib
            break
    return _NATIVE


def decode_batch(paths, t_pad: int, n_threads: int = 0):
    """Decode many files in parallel into a zero-padded (B, t_pad) float32
    array + true lengths. Uses the native threaded loader when available
    (one ctypes call for the whole bucket — the GIL is released throughout);
    falls back to a per-file python loop.

    Returns (batch (B, t_pad) float32, lengths (B,) int64). Failed files
    decode to silence with length 0.
    """
    n = len(paths)
    if n == 0:  # fake all-padding microbatch (trailing accum-group square-off)
        return np.zeros((0, t_pad), np.float32), np.zeros(0, np.int64)
    lib = _load_native()
    if lib is not None and all(
        p.lower().endswith((".flac", ".wav")) for p in paths
    ):
        out = np.zeros((n, t_pad), np.float32)
        lengths = np.zeros(n, np.int64)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.audioio_load_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_pad, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            n_threads,
        )
        # retry any failed row individually (a transient open/read error in
        # the threaded loader must not silently yield a silent utterance)
        for i in np.nonzero(lengths == 0)[0]:
            try:
                wav = decode(paths[int(i)])
            except (RuntimeError, OSError):
                continue
            m = min(len(wav), t_pad)
            out[i, :m] = wav[:m]
            lengths[i] = m
        if lengths.sum() > 0:
            return out, lengths
    out = np.zeros((n, t_pad), np.float32)
    lengths = np.zeros(n, np.int64)
    for i, p in enumerate(paths):
        try:
            wav = decode(p)
        except (RuntimeError, OSError):
            continue
        m = min(len(wav), t_pad)
        out[i, :m] = wav[:m]
        lengths[i] = m
    return out, lengths


def decode(path: str) -> np.ndarray:
    """Decode an audio file to mono float32 [-1, 1]."""
    lib = _load_native()
    if lib is not None and path.lower().endswith((".flac", ".wav")):
        sr = ctypes.c_int(0)
        n = lib.audioio_decode(path.encode(), None, 0, ctypes.byref(sr))
        if n > 0:
            buf = np.empty(int(n), dtype=np.float32)
            got = lib.audioio_decode(
                path.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                int(n),
                ctypes.byref(sr),
            )
            if got == n:
                return buf
    try:
        import soundfile

        wav, _sr = soundfile.read(path, dtype="float32", always_2d=False)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        return wav.astype(np.float32)
    except ImportError:
        pass
    if path.lower().endswith(".wav"):
        from scipy.io import wavfile

        _sr, wav = wavfile.read(path)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        return wav
    raise RuntimeError(
        f"no decoder available for {path}: build native/libaudioio.so (make -C native)"
    )
