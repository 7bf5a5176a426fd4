"""Checkpoint/resume contract (SURVEY.md §5.4): Orbax top-k by v_loss + last,
restore into a state template, and the (yaml, msgpack) export pair."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fithubert_tpu.train.checkpoint import CheckpointManager, export_student
from fithubert_tpu.train.step import TrainState


def _state(step, scale):
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params={"w": jnp.full((4, 4), scale, jnp.float32),
                "b": jnp.zeros((4,), jnp.float32)},
        opt_state={"m": jnp.full((4, 4), scale / 10, jnp.float32)},
        extra_vars={},
    )


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    s = _state(7, 3.0)
    mgr.save(7, jax.device_get(s), v_loss=1.25)
    mgr.wait()
    assert mgr.latest_step() == 7

    template = jax.device_get(_state(0, 0.0))
    restored = mgr.restore(template)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 3.0)
    np.testing.assert_allclose(np.asarray(restored.opt_state["m"]), 0.3, rtol=1e-6)


def test_top_k_keeps_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    losses = {1: 5.0, 2: 1.0, 3: 3.0, 4: 0.5}
    for step, v in losses.items():
        mgr.save(step, jax.device_get(_state(step, float(step))), v_loss=v)
    mgr.wait()
    # best dir retains the 2 lowest-v_loss steps (2 and 4)
    best = mgr.restore_best(jax.device_get(_state(0, 0.0)))
    assert int(best.step) == 4
    # last dir retains the newest
    assert mgr.latest_step() == 4


def test_restore_none_when_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() is None
    assert mgr.restore(jax.device_get(_state(0, 0.0))) is None


def test_export_pair_loadable(tmp_path):
    from flax import serialization

    from fithubert_tpu.config import ExperimentConfig, load_yaml_config

    cfg = ExperimentConfig()
    params = {"layer": {"kernel": jnp.ones((3, 5))}}
    yaml_path, weights_path = export_student(cfg, params, str(tmp_path))
    cfg2 = load_yaml_config(yaml_path)
    assert cfg2.distiller.encoder_layers == cfg.distiller.encoder_layers
    from fithubert_tpu.train.checkpoint import load_student_export

    variables = load_student_export(weights_path)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["layer"]["kernel"]), np.ones((3, 5))
    )


def test_export_pair_with_batch_stats(tmp_path):
    """Conformer students carry batch_stats; the export pair must round-trip
    them (without them the expert cannot run the exported model)."""
    from fithubert_tpu.config import ExperimentConfig
    from fithubert_tpu.train.checkpoint import load_student_export

    cfg = ExperimentConfig()
    params = {"layer": {"kernel": jnp.ones((3, 5))}}
    extras = {"batch_stats": {"bn": {"mean": jnp.full((5,), 2.0)}}}
    _, weights_path = export_student(cfg, params, str(tmp_path), tag="conf",
                                     extra_vars=extras)
    variables = load_student_export(weights_path)
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn"]["mean"]), np.full((5,), 2.0)
    )
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["layer"]["kernel"]), np.ones((3, 5))
    )


def test_preemption_save_last_never_pollutes_best(tmp_path):
    """Preemption snapshots carry no v_loss; save_last must land in last/
    ONLY — an inf-metric step in best/ could occupy a top-k slot early in
    training (VERDICT r2 weak #5)."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    mgr.save(1, jax.device_get(_state(1, 1.0)), v_loss=2.0)
    mgr.save_last(2, jax.device_get(_state(2, 2.0)))  # preemption path
    mgr.wait()
    # last/ advanced to the preemption step; best/ still holds only step 1
    assert mgr.latest_step() == 2
    best = mgr.restore_best(jax.device_get(_state(0, 0.0)))
    assert int(best.step) == 1
    restored = mgr.restore(jax.device_get(_state(0, 0.0)))
    assert int(restored.step) == 2
