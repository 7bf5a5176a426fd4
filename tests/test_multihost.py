"""Multi-host smoke over loopback: two local processes initialize
jax.distributed (the DCN path, parallel/distributed.py), run a cross-process
reduction on a global mesh, and stride the bucketed input pipeline per host
without overlap.

TPU-equivalent of the reference's 2-process DDP config of record
(reference train.py:494, data/conf/fithubert.yaml:8).
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_loopback():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            FITHUBERT_COORDINATOR=f"127.0.0.1:{port}",
            FITHUBERT_NUM_PROCESSES="2",
            FITHUBERT_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # 1 CPU device per fake host
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, out + err
        outs.append(out)

    buckets = {}
    for out in outs:
        m = re.search(r"WORKER_OK pid=(\d) total=(\S+) buckets=(\S*)", out)
        assert m, out
        buckets[int(m.group(1))] = set(m.group(3).split(","))
    # per-host bucket shards are disjoint and cover everything
    assert buckets[0].isdisjoint(buckets[1]), buckets
    assert buckets[0] | buckets[1] == {f"f{i}" for i in range(8)}, buckets
