"""Checkpoint / resume via Orbax + the export pair for the s3prl expert.

Reference contract (SURVEY.md §5.4): Lightning ModelCheckpoint keeps top-3 by
v_loss plus last (reference train.py:475-483), resumes via ckpt_path
(train.py:506-509), and a companion YAML written at init (utils/utils.py:153-
180) is the model-config half the s3prl expert later consumes. Here:

  - Orbax CheckpointManager `best/` keeps top-k by v_loss; `last/` keeps the
    newest (async-capable, atomic).
  - `export_student(...)` writes the (yaml, student-weights msgpack) pair —
    the checkpoint contract consumed by export/expert.py.

Multi-host: pass the GLOBAL on-device state (jax.Arrays) to save/restore
from EVERY process — orbax coordinates the sharded write (each process
persists its addressable shards; the primary commits), which is the only
correct path when a model>1 mesh leaves TP shards non-addressable from
host 0. Requires `directory` on a filesystem shared by all hosts (the
standard multi-host TPU setup). Exercised by tests/test_multihost.py over
a 2-process loopback with cross-process TP-sharded params.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from flax import serialization

from fithubert_tpu.config import ExperimentConfig, dump_yaml_config


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)

        # Orbax derives its cross-process barrier keys from a PER-INSTANCE
        # counter ("_async_write_complete.<n>"), so two managers in one
        # process — best/ and last/ here, or two CheckpointManagers over
        # different run dirs — reuse identical keys. Under jax.distributed
        # an async save of one can still hold barrier .n open on a slow
        # host while the other enters its own .n: FAILED_PRECONDITION
        # "Barrier already ongoing" (reproduced under load in
        # tests/test_multihost.py). A per-manager key prefix derived from
        # the directory (identical on every host, distinct per manager)
        # makes the keyspaces disjoint.
        # NOTE: the tag must be identical on every host — derive it from the
        # run directory's BASENAME, not its absolute path (a shared FS can be
        # mounted at different paths per host). Two distinct run dirs sharing
        # a basename in one jax.distributed session would still collide, but
        # that merely reverts those two to the pre-fix status quo.
        def _mp_opts(sub: str):
            tag = hashlib.md5(
                os.path.join(os.path.basename(directory), sub).encode()
            ).hexdigest()[:10]
            return ocp.options.MultiprocessingOptions(
                barrier_sync_key_prefix=f"{sub}_{tag}")

        self._best = ocp.CheckpointManager(
            os.path.join(directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_top_k,
                best_fn=lambda m: m["v_loss"],
                best_mode="min",
                multiprocessing_options=_mp_opts("best"),
            ),
        )
        self._last = ocp.CheckpointManager(
            os.path.join(directory, "last"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, multiprocessing_options=_mp_opts("last"),
            ),
        )

    def save(self, step: int, state, v_loss: float) -> None:
        args = ocp.args.StandardSave(state)
        self._best.save(step, args=args, metrics={"v_loss": float(v_loss)})
        self._last.save(step, args=ocp.args.StandardSave(state))

    def save_last(self, step: int, state) -> None:
        """Resumable snapshot WITHOUT a v_loss metric — preemption saves land
        here: routing them through save(v_loss=inf) would let an inf-metric
        snapshot occupy one of the k best/ slots early in training."""
        self._last.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._last.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure of `state_template` (abstract ok).

        An explicit `step` is looked up in BOTH managers: last/ keeps only
        the newest step, while historical steps survive under best/."""
        if step is None:
            step = self._last.latest_step()
            if step is None:
                return None
        mgr = (
            self._last if step in (self._last.all_steps() or []) else self._best
        )
        if step not in (mgr.all_steps() or []):
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_best(self, state_template):
        step = self._best.best_step()
        if step is None:
            return None
        return self._best.restore(step, args=ocp.args.StandardRestore(state_template))


def export_student(
    cfg: ExperimentConfig, student_params: Any, out_dir: str,
    tag: str = "student", extra_vars: Any = None,
) -> Tuple[str, str]:
    """Write the (config yaml, weights msgpack) export pair.

    This is the framework's equivalent of the Lightning-ckpt +
    dumped-yaml pair the reference s3prl expert loads (fithubert/expert.py:
    25-45, stripping the 'student_model.' prefix); ours stores the full
    variables dict — params plus any extra collections (conformer students
    carry 'batch_stats' running statistics the expert needs at inference)."""
    os.makedirs(out_dir, exist_ok=True)
    yaml_path = os.path.join(out_dir, f"{tag}.yaml")
    dump_yaml_config(cfg, yaml_path)
    weights_path = os.path.join(out_dir, f"{tag}.msgpack")
    variables = {"params": jax.device_get(student_params)}
    for k, v in (jax.device_get(extra_vars) or {}).items():
        variables[k] = v
    with open(weights_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    return yaml_path, weights_path


def load_student_export(weights_path: str):
    """Read an export msgpack -> variables dict ({'params': ..., possibly
    'batch_stats': ...}). Accepts the older bare-params layout too."""
    with open(weights_path, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    if "params" not in variables:
        variables = {"params": variables}
    return variables
