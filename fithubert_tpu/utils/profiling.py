"""Tracing / profiling, first-class (SURVEY.md §5.1 — the reference has none).

Two tools:
  - `trace(...)`: context manager around jax.profiler.trace writing a
    TensorBoard-loadable trace (xplane) for a window of steps.
  - `StepTimer`: cheap wall-clock per-step timing with jittered host sync,
    giving steps/sec and audio-sec/sec without a profiler attached.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace window. View with TensorBoard or xprof."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceMe timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/sec + device-time accounting.

    `tick(audio_sec)` after each step; sync_every controls how often a real
    device barrier is taken on a step output so timing stays honest without
    serializing every step. The barrier is the fetch-based one from
    utils/barrier.py: over the axon tunnel block_until_ready alone returns
    before remote execution finishes, which would inflate steps/sec (the same
    failure that produced the bogus BENCH_r02 headline)."""

    def __init__(self, sync_every: int = 20, barrier=None,
                 fetch_timeout: float = 60.0):
        self.sync_every = max(1, sync_every)
        self._barrier = barrier  # None -> watchdogged fetch barrier
        self._fetch_timeout = fetch_timeout
        self.fetch_ok = True
        self._n = 0
        self._t0: Optional[float] = None
        self._audio = 0.0
        self.steps_per_sec = 0.0
        self.audio_sec_per_sec = 0.0

    def _sync(self, target) -> None:
        """One honest barrier, guarded against a wedged tunnel fetch path.

        The fetch can wedge for extended periods while compute continues
        (CLAUDE.md); an unguarded device_get here would stall training on a
        healthy chip. After the first timeout the timer stops taking fetch
        barriers (each timed-out attempt leaks one daemon thread), degrades
        to block_until_ready, and flags every subsequent rate as untrusted
        in tick()'s return — degraded, but LOUDLY."""
        if self._barrier is not None:
            self._barrier(target)
            return
        from fithubert_tpu.utils.barrier import timed_fetch_barrier

        if self.fetch_ok:
            if not timed_fetch_barrier(target, timeout=self._fetch_timeout):
                self.fetch_ok = False
                print(
                    "[StepTimer] device->host fetch wedged (>"
                    f"{self._fetch_timeout:.0f}s); falling back to "
                    "block_until_ready — steps/s is now UNTRUSTED",
                    flush=True,
                )
        if not self.fetch_ok:
            jax.block_until_ready(target)

    def tick(self, sync_target=None, audio_sec: float = 0.0,
             steps: int = 1) -> Dict[str, float]:
        """`steps` > 1 when one launch ran several optimizer steps
        (train.steps_per_launch); the tick still costs one sync at most."""
        now = time.perf_counter()
        if self._t0 is None:
            # the first tick only anchors the clock: its step covers the jit
            # compile, and counting it would both inflate the step count and
            # pollute the rate with compile time
            self._t0 = now
            return {
                "steps_per_sec": self.steps_per_sec,
                "audio_sec_per_sec": self.audio_sec_per_sec,
            }
        self._n += steps
        self._audio += audio_sec
        if self._n % self.sync_every < steps and sync_target is not None:
            self._sync(sync_target)
            now = time.perf_counter()
        dt = max(now - self._t0, 1e-9)
        self.steps_per_sec = self._n / dt
        self.audio_sec_per_sec = self._audio / dt
        out = {
            "steps_per_sec": self.steps_per_sec,
            "audio_sec_per_sec": self.audio_sec_per_sec,
        }
        if not self.fetch_ok:
            out["timing_untrusted"] = 1.0
        return out
