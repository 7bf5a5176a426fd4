"""Multi-host (multi-process) runtime initialization.

The reference's multi-device story is single-host Lightning DDP over NCCL
(reference train.py:492-501). The TPU-native equivalent for pod slices is the
standard JAX multi-controller runtime: every host runs the same program,
`jax.distributed.initialize()` wires them up over DCN, the device mesh spans
all chips, and the input pipeline shards buckets per host
(data/librispeech.py host_id/num_hosts).

Call `maybe_initialize()` once at entry. On single-host (or when coordinator
env vars are absent) it is a no-op, so the same train.py works everywhere.
"""

from __future__ import annotations

import os
from typing import Tuple


def maybe_initialize() -> Tuple[int, int]:
    """Initialize jax.distributed if a multi-process env is configured.

    Honors the standard JAX env vars (JAX_COORDINATOR_ADDRESS / Cloud TPU
    metadata) plus explicit FITHUBERT_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}.
    Returns (process_index, process_count).
    """
    import jax

    coord = os.environ.get("FITHUBERT_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    already = getattr(jax.distributed.initialize, "_called", False)
    if coord and not already:
        kwargs = {"coordinator_address": coord}
        if os.environ.get("FITHUBERT_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["FITHUBERT_NUM_PROCESSES"])
        if os.environ.get("FITHUBERT_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["FITHUBERT_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        jax.distributed.initialize._called = True  # type: ignore[attr-defined]
    return jax.process_index(), jax.process_count()
