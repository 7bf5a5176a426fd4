"""Root PRNG key construction for the training step.

The step key only feeds dropout/specaug/layerdrop mask generation — streams
whose exact values are arbitrary. On TPU, threefry (JAX's default) computes
those bits on the VPU; the hardware `rbg` generator produces them nearly for
free. Measured on a v5e at the fithubert.yaml step (2026-08-17): 88.5 ms
threefry -> 84.7 ms rbg (-4.3%; dropout in total costs 17.4 ms/step — the
rest is mask materialization + application, not bit generation).

Parameter INIT keys stay threefry everywhere — init reproducibility is part
of the test contract; only the per-step mask streams switch.
"""

from __future__ import annotations

import jax


def root_step_key(seed: int, impl: str = "auto"):
    """Key for the jitted train step's dropout/specaug/layerdrop streams.

    impl: 'auto' (rbg on TPU, threefry elsewhere), 'threefry', or 'rbg'.
    Cross-platform reproducibility of mask streams only holds for threefry;
    rbg streams are backend-defined (and faster on TPU)."""
    if impl == "auto":
        impl = "rbg" if jax.devices()[0].platform == "tpu" else "threefry"
    if impl in ("default", "threefry", "threefry2x32"):
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)
