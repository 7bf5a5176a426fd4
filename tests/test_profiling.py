"""Honest timing barriers (utils/barrier.py) + StepTimer wiring.

Over the axon tunnel, jax.block_until_ready does NOT reliably wait for
remote execution; the one honest barrier is a device->host fetch. BENCH_r02's
headline was 186x too fast because the bench silently degraded to
block_until_ready — these tests pin the replacement contract."""

import jax
import jax.numpy as jnp
import numpy as np

from fithubert_tpu.utils.barrier import fetch_barrier, probe_fetch
from fithubert_tpu.utils.profiling import StepTimer


def test_probe_fetch_healthy_backend():
    assert probe_fetch(timeout=30.0) is True


def test_timed_fetch_barrier_healthy_backend():
    from fithubert_tpu.utils.barrier import timed_fetch_barrier

    assert timed_fetch_barrier(jnp.ones((2, 2)), timeout=30.0) is True


def test_fetch_barrier_accepts_trees_and_scalars():
    fetch_barrier(jnp.ones((4, 4)))
    fetch_barrier({"a": jnp.zeros((2,)), "b": jnp.ones((3, 3))})
    fetch_barrier(jnp.float32(1.0))


def test_steptimer_uses_watchdogged_fetch_by_default():
    """The default sync must be the WATCHDOGGED fetch barrier: a plain
    block_until_ready default silently reintroduces the r02 failure, and an
    unguarded device_get would stall training when the tunnel's fetch path
    wedges while compute stays healthy."""
    timer = StepTimer(sync_every=1)
    assert timer._barrier is None  # None -> timed_fetch_barrier in _sync
    assert timer.fetch_ok
    x = jnp.ones(())
    timer.tick(sync_target=x)  # anchor
    timer.tick(sync_target=x)  # real sync through the watchdogged path
    assert timer.fetch_ok
    assert "timing_untrusted" not in timer.tick(sync_target=x)


def test_steptimer_degrades_loudly_on_wedged_fetch(monkeypatch):
    """A wedged fetch (timed_fetch_barrier -> False) must flip the timer to
    block_until_ready, flag every subsequent rate untrusted, and never be
    retried (each timed-out attempt leaks a daemon thread)."""
    import fithubert_tpu.utils.barrier as barrier_mod

    attempts = []

    def wedged(x, timeout):
        attempts.append(timeout)
        return False

    monkeypatch.setattr(barrier_mod, "timed_fetch_barrier", wedged)
    timer = StepTimer(sync_every=1, fetch_timeout=2.0)
    x = jnp.ones(())
    timer.tick(sync_target=x)  # anchor
    out = timer.tick(sync_target=x)
    assert not timer.fetch_ok
    assert out["timing_untrusted"] == 1.0
    out = timer.tick(sync_target=x)
    assert out["timing_untrusted"] == 1.0
    assert attempts == [2.0]  # no second wedge attempt


def test_steptimer_barrier_actually_called():
    calls = []

    def spy(x):
        calls.append(x)
        fetch_barrier(x)

    timer = StepTimer(sync_every=2, barrier=spy)
    x = jnp.ones(())
    for _ in range(5):
        timer.tick(sync_target=x, audio_sec=1.0)
    # first tick anchors the clock (no barrier); ticks 2 and 4 sync
    assert len(calls) == 2
    assert timer.steps_per_sec > 0
    assert np.isclose(timer.audio_sec_per_sec / timer.steps_per_sec, 1.0)


def test_root_step_key_dispatch():
    """'auto' = threefry on CPU (cross-platform-reproducible), explicit
    'rbg' returns a typed rbg key; both are valid dropout-stream roots."""
    from fithubert_tpu.utils.rng import root_step_key

    k_auto = root_step_key(0, "auto")
    k_thr = root_step_key(0, "threefry")
    assert np.array_equal(np.asarray(k_auto), np.asarray(k_thr))  # cpu: same
    k_rbg = root_step_key(0, "rbg")
    # fold_in/split/bernoulli all work on the rbg stream (the step's usage)
    sub = jax.random.fold_in(k_rbg, 7)
    bits = jax.random.bernoulli(sub, 0.5, (64,))
    assert bits.shape == (64,)
    assert bool(bits.any()) and not bool(bits.all())
