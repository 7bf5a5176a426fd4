"""Regression test for the driver's multi-chip dryrun entry.

Round-1 failure mode (MULTICHIP_r01.json): dryrun_multichip set the
host-platform device-count flag but never pinned jax_platforms=cpu
in-process, so eager jnp ops dispatched to the tunneled TPU backend and died
on a libtpu version skew. Running it here (under the conftest 8-device CPU
mesh) keeps the entry importable, hermetic, and passing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)  # asserts finite loss internally
