"""Multi-host smoke over loopback: two local processes initialize
jax.distributed (the DCN path, parallel/distributed.py), run a cross-process
reduction on a global mesh, assemble per-host row-striped batches with
make_array_from_process_local_data, and execute ONE fused KD train step over
the global mesh from a shared on-disk corpus — the real multi-host training
data path end to end.

TPU-equivalent of the reference's 2-process DDP config of record
(reference train.py:494, data/conf/fithubert.yaml:8).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_corpus(root):
    from tests.flac_writer import write_flac

    chap = os.path.join(root, "train-tiny", "1", "2")
    os.makedirs(chap, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        n = 4000 + 321 * i
        sig = np.round(2000 * np.sin(np.arange(n) * 0.03)
                       + 40 * rng.standard_normal(n)).astype(np.int64)
        write_flac(os.path.join(chap, f"1-2-{i:04d}.flac"), [sig],
                   kind="verbatim")


def test_two_process_loopback(tmp_path):
    corpus = str(tmp_path / "libri")
    _make_corpus(corpus)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            FITHUBERT_COORDINATOR=f"127.0.0.1:{port}",
            FITHUBERT_NUM_PROCESSES="2",
            FITHUBERT_PROCESS_ID=str(pid),
            FITHUBERT_TEST_CORPUS=corpus,
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
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, out + err
        outs.append(out)

    losses, tp_losses = set(), set()
    for out in outs:
        m = re.search(
            r"WORKER_OK pid=(\d) total=(\S+) loss=(\S+) tp_loss=(\S+)", out)
        assert m, out
        assert m.group(3) != "None"
        assert m.group(4) != "None"
        losses.add(m.group(3))
        tp_losses.add(m.group(4))
    assert len(losses) == 1, losses  # both hosts computed the same global loss
    assert len(tp_losses) == 1, tp_losses  # cross-process TP phase agreed too
