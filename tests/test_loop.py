"""Training-loop behaviors: checkpoint resume continues from the restored
step (reference ckpt_path resume, train.py:506-509) and the export pair is
written at the end of training."""

import dataclasses
import os

import pytest

from fithubert_tpu.config import load_yaml_config


def _smoke_cfg(out_dir, max_steps, num_epochs=8):
    cfg = load_yaml_config("configs/smoke.yaml")
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_num_batches=4,
                                 synthetic_wav_length=4000, length_quantum=2000),
        train=dataclasses.replace(
            cfg.train, output_dir=str(out_dir), max_steps=max_steps,
            num_epochs=num_epochs, batch_size=2, accumulate_grad_batches=1,
            log_every=100,
        ),
    )


@pytest.mark.slow
def test_resume_continues_from_checkpoint(tmp_path):
    from fithubert_tpu.train.loop import run_training

    out = tmp_path / "run"
    r1 = run_training(_smoke_cfg(out, max_steps=4), resume=False)
    assert r1["steps"] == 4

    # second invocation resumes from the saved step and continues
    r2 = run_training(_smoke_cfg(out, max_steps=8), resume=True)
    assert r2["steps"] == 8

    # export pair written
    assert os.path.exists(out / "student.yaml")
    assert os.path.exists(out / "student.msgpack")
    # timestamped config dump exists alongside config.yaml
    yamls = [f for f in os.listdir(out) if f.endswith(".yaml")]
    assert len(yamls) >= 3  # config.yaml + <timestamp>.yaml + student.yaml


def test_test_only_mode(tmp_path):
    from fithubert_tpu.train.loop import run_training

    out = tmp_path / "run_t"
    r = run_training(_smoke_cfg(out, max_steps=2, num_epochs=1), resume=False,
                     test_only=True)
    assert "test_loss" in r


@pytest.mark.slow
def test_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training must save a resumable checkpoint and stop."""
    import os
    import signal
    import threading

    from fithubert_tpu.train.loop import run_training

    out = tmp_path / "run_p"
    # fire SIGTERM shortly after training starts
    timer = threading.Timer(10.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        r = run_training(_smoke_cfg(out, max_steps=0, num_epochs=500), resume=False)
    finally:
        timer.cancel()
    assert r["preempted"]
    assert r["steps"] < 2000  # stopped early
    # resumable: a later invocation restores and finishes
    r2 = run_training(_smoke_cfg(out, max_steps=r["steps"] + 2, num_epochs=500),
                      resume=True)
    assert r2["steps"] >= r["steps"]


@pytest.mark.slow
def test_steps_per_launch_chained_loop(tmp_path):
    """steps_per_launch > 1: the loop chains same-shape launch groups via
    lax.scan, counts every step, and still respects max_steps (granularity
    is the launch, so the count may land on a chain boundary)."""
    from fithubert_tpu.train.loop import run_training

    out = tmp_path / "run_c"
    cfg = _smoke_cfg(out, max_steps=6, num_epochs=8)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_launch=2)
    )
    r = run_training(cfg, resume=False)
    assert 6 <= r["steps"] <= 7  # may overshoot by < steps_per_launch
    assert os.path.exists(out / "student.msgpack")


def test_partial_runs_do_not_chain():
    """Only FULL k-length runs may take the chained executable: each
    distinct partial run length would jit a fresh ~80 s chained compile on
    the remote TPU endpoint, dwarfing the per-step win."""
    from fithubert_tpu.train.loop import _use_chain

    assert _use_chain(4, 4)
    assert not _use_chain(3, 4)  # flushed early: single-step fallback
    assert not _use_chain(2, 4)
    assert not _use_chain(1, 4)
    assert not _use_chain(1, 1)  # chaining disabled entirely


def test_launch_groups_chunking():
    """Runs break on shape change and cap at k; every batch appears exactly
    once, in order."""
    import numpy as np

    from fithubert_tpu.train.loop import _launch_groups

    def b(t, tag):
        return {"x": np.zeros((2, t)), "padding_mask": np.zeros((2, t), bool),
                "_tag": tag}

    seq = [b(100, 0), b(100, 1), b(100, 2), b(200, 3), b(200, 4), b(100, 5)]
    pairs = [(raw, raw) for raw in seq]
    runs = list(_launch_groups(pairs, 2))
    got = [[raw["_tag"] for raw, _dev in run] for run in runs]
    # 100s: [0,1] then [2] (cap 2, then shape change), 200s: [3,4], tail [5]
    assert got == [[0, 1], [2], [3, 4], [5]]
    # k=1 degenerates to singletons
    assert [[r["_tag"] for r, _d in run] for run in _launch_groups(pairs, 1)] \
        == [[0], [1], [2], [3], [4], [5]]


@pytest.mark.slow
def test_hint_init_sees_full_precision_teacher(tmp_path, monkeypatch):
    """init_student_from_teacher must graft from the teacher's fp32 weights,
    not the bf16 copies prepare_teacher_params stores for the frozen
    forward (regression: shard_teacher used to run first)."""
    import jax

    import fithubert_tpu.models.surgery as surgery
    from fithubert_tpu.train.loop import run_training

    real = surgery.init_student_from_teacher
    seen = {}

    def spy(student_params, teacher_params, dcfg):
        seen["dtypes"] = {
            str(leaf.dtype) for leaf in jax.tree.leaves(teacher_params)
        }
        return real(student_params, teacher_params, dcfg)

    monkeypatch.setattr(surgery, "init_student_from_teacher", spy)
    cfg = _smoke_cfg(tmp_path / "out", max_steps=1, num_epochs=1)
    cfg = dataclasses.replace(
        cfg,
        distiller=dataclasses.replace(cfg.distiller, init_conv_layers=True),
        train=dataclasses.replace(cfg.train, use_fp16=True),
    )
    run_training(cfg, resume=False)
    assert seen, "hint-init was never invoked"
    assert "bfloat16" not in seen["dtypes"], (
        "teacher params were bf16-quantized before the student hint-init"
    )
