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

# Persistent compilation cache: the suite is dominated by CPU jit compiles of
# the same train/eval steps (this container has ONE core); warm runs cut the
# wall time several-fold. Keyed by HLO hash — safe across code edits.
from fithubert_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
