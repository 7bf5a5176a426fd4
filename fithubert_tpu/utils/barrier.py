"""Honest device-synchronization barriers for timing over the axon tunnel.

`jax.block_until_ready` does NOT reliably wait for remote execution over the
tunneled TPU backend (see CLAUDE.md): it can return while the chip is still
computing, so any timing loop synced with it measures *dispatch*, not
execution.  The only honest barrier observed to work is a device->host fetch
(even of a single scalar).  This module centralizes that pattern for bench.py
and the in-loop StepTimer so both report the same (true) rates.

The tunnel's fetch path can also wedge entirely while compute keeps working —
`probe_fetch` runs one fetch under a watchdog thread so callers can detect a
dead fetch path instead of hanging; they must then either fail or mark their
numbers untrusted, never silently degrade to block_until_ready.
"""

from __future__ import annotations

import threading

import numpy as np


def fetch_barrier(x) -> None:
    """Block until `x` has truly finished executing on device.

    block_until_ready first (cheap, correct on non-tunneled backends), then a
    one-scalar device->host fetch of the first leaf — the only barrier that
    provably waits for remote execution over the tunnel."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timed_fetch_barrier(x, timeout: float = 60.0) -> bool:
    """`fetch_barrier` under a watchdog thread.

    Returns True iff the fetch completed within `timeout` seconds.  On False
    the tunnel's fetch path is wedged (compute may still be healthy) and the
    daemon fetch thread is intentionally leaked — callers must stop taking
    fetch barriers (one leaked thread per attempt) and mark their timings
    untrusted rather than hang the training loop."""
    done = []

    def run():
        try:
            fetch_barrier(x)
            done.append(True)
        except Exception:
            pass

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=timeout)
    return bool(done)


def probe_fetch(timeout: float = 60.0) -> bool:
    """True iff a device->host fetch completes within `timeout` seconds.

    Run before (and between) timed sections: the tunnel's fetch path can
    wedge for extended periods while compute continues, and a wedged fetch
    would otherwise hang the caller forever."""
    import jax.numpy as jnp

    return timed_fetch_barrier(jnp.zeros((1,)), timeout=timeout)
