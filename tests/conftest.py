"""Test fixtures: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPUs via XLA's host-platform
device-count trick (SURVEY.md §4 implication).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# Default: everything on the virtual 8-device CPU mesh. Setting
# FITHUBERT_TEST_PLATFORM=tpu leaves the platform resolution alone so the
# real (tunneled) chip is used instead (for the *_tpu.py test files, which
# skip on cpu) — the tunnel backend only initializes under the DEFAULT
# platform resolution, so we must not set jax_platforms at all there, and
# the env var must be honored here because the axon sitecustomize overrides
# JAX_PLATFORMS from the shell.
if os.environ.get("FITHUBERT_TEST_PLATFORM", "cpu") == "cpu":
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
