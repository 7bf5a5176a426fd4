"""Worker for the multi-host loopback smoke test (spawned by
test_multihost.py, one process per fake host). Exercises the real
jax.distributed DCN path: coordinator handshake, a global mesh spanning both
processes' devices, a cross-process psum, and per-host bucket striding.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fithubert_tpu.parallel.distributed import maybe_initialize
from fithubert_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    pid, n = maybe_initialize()
    assert n == 2, (pid, n)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * jax.local_device_count(), devs
    mesh = Mesh(np.asarray(devs), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # each process contributes (pid + 1) per local device row
    local = np.full((jax.local_device_count(), 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = 4.0 * jax.local_device_count() * (1 + 2)
    got = float(np.asarray(jax.device_get(total)))
    assert got == expect, (got, expect)

    # per-host bucket striding (data/librispeech.py host_id::num_hosts)
    from fithubert_tpu.data.librispeech import make_buckets

    rows = [(f"f{i}", 1000 - i) for i in range(8)]
    mine = make_buckets(rows, 2)[pid::n]
    names = ",".join(p for b in mine for (p, _l) in b)
    print(f"WORKER_OK pid={pid} total={got} buckets={names}", flush=True)


if __name__ == "__main__":
    main()
