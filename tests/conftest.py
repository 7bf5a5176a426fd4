"""Test fixtures: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPUs via XLA's host-platform
device-count trick (SURVEY.md §4 implication).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is intentionally NOT enabled for
# the (CPU) test suite — reloading serialized XLA:CPU AOT executables tripped
# nondeterministic SIGABRTs (see utils/cache.py). scan_layers keeps the
# suite's compile cost inside budget instead.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
