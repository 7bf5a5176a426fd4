"""Training orchestration: the L5/L6 equivalent of the reference's Lightning
Trainer wiring (reference train.py:449-509) — epochs, per-epoch random-layer
resampling, validation with v_loss monitoring, top-k + last checkpointing,
early stopping, resume, and final export.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fithubert_tpu.config import ExperimentConfig, dump_yaml_config, timestamp_tag
from fithubert_tpu.data import make_dataset
from fithubert_tpu.parallel import make_mesh
from fithubert_tpu.train.checkpoint import CheckpointManager, export_student
from fithubert_tpu.train.step import Distiller
from fithubert_tpu.utils.logging import MetricsLogger


def _launch_groups(pairs, k):
    """Group consecutive (raw, device) batch pairs into runs of up to k
    IDENTICAL shapes for steps_per_launch chaining. Bucketed data is
    shape-quantized but not shape-uniform, and a lax.scan chain needs one
    stacked shape — a shape change (or epoch end) flushes the run early;
    short runs fall back to single-step launches."""
    run, key = [], None

    def shape_key(batch):
        return tuple(
            (name, tuple(np.asarray(v).shape))
            for name, v in sorted(batch.items())
            if not name.startswith("_")
        )

    for raw, dev in pairs:
        sk = shape_key(raw)
        if run and (sk != key or len(run) == k):
            yield run
            run = []
        run.append((raw, dev))
        key = sk
    if run:
        yield run


def _use_chain(k: int, steps_per_launch: int) -> bool:
    """Only FULL runs take the chained executable. A partial run (shape
    change or epoch end flushed it early) would jit a DISTINCT chained
    executable per run length — each TPU compile costs ~80 s over the
    remote endpoint, dwarfing the ~ms/step a chain saves — so short runs
    fall back to single-step launches, whose executable always exists."""
    return k == steps_per_launch and k > 1


def _sample_rand_layers(rng: random.Random, cfg: ExperimentConfig) -> np.ndarray:
    """Per-epoch random distill layers (reference train.py:88-91,172-174):
    sample(range(N-1), k) — the release config's k = N-1 selects all."""
    n = cfg.distiller.encoder_layers
    k = cfg.loss.distil_random_layer
    return np.asarray(rng.sample(range(n - 1), k), dtype=np.int32)


def load_teacher_checkpoint(cfg: ExperimentConfig):
    """Load converted/fairseq teacher weights + geometry if a checkpoint
    exists; returns (geometry | None, variables | None). The geometry from
    the checkpoint is authoritative (extractor mode/spec, pre-/post-LN,
    pos-conv shape...) — the yaml's TeacherConfig only covers smoke runs."""
    path = cfg.teacher.teacher_model
    if path and os.path.exists(path):
        from fithubert_tpu.export.fairseq_import import load_teacher_any

        return load_teacher_any(path)
    print(f"[teacher] checkpoint '{path}' not found — using randomly "
          f"initialized {cfg.teacher.model_type} teacher (smoke mode)")
    return None, None


class PreemptionGuard:
    """SIGTERM/SIGINT-aware stop flag: cloud TPU preemptions deliver SIGTERM
    with a grace window — the loop checks `should_stop` each step and saves a
    resumable checkpoint before exiting (the reference has no failure
    handling beyond EarlyStopping, SURVEY.md §5.3)."""

    def __init__(self):
        import signal

        self.should_stop = False
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not the main thread (e.g. under pytest-xdist)
                pass

    def _handler(self, signum, frame):
        print(f"[preemption] signal {signum} received — will checkpoint and stop")
        self.should_stop = True

    def restore(self):
        import signal

        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


def run_training(
    cfg: ExperimentConfig,
    resume: bool = True,
    test_only: bool = False,
) -> Dict[str, float]:
    from fithubert_tpu.parallel.distributed import maybe_initialize

    host_id, num_hosts = maybe_initialize()
    # safe to probe the backend now (distributed runtime is up): enables the
    # persistent TPU compile cache for unset-platform runs; no-op on CPU
    from fithubert_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(probe_backend=True)
    out_dir = cfg.train.output_dir
    os.makedirs(out_dir, exist_ok=True)
    if host_id == 0:
        # model-config half of the checkpoint contract (reference
        # utils/utils.py:153-184 writes a Seoul-timestamped yaml)
        dump_yaml_config(cfg, os.path.join(out_dir, "config.yaml"))
        dump_yaml_config(cfg, os.path.join(out_dir, timestamp_tag() + ".yaml"))
    logger = MetricsLogger(out_dir)

    mesh = make_mesh(cfg.train.num_devices)
    n_data = mesh.shape["data"]
    batch_sh = NamedSharding(mesh, P(None, "data"))  # (A, B, T): shard B

    # datasets take the GLOBAL batch (batch_size rows per device on the
    # 'data' axis) and stripe rows per host internally (SURVEY.md §5.8)
    global_batch = cfg.train.batch_size * n_data
    train_data = make_dataset(
        cfg.data, cfg.data.train_set, global_batch,
        accum=cfg.train.accumulate_grad_batches, shuffle=True, seed=cfg.train.seed,
        host_id=host_id, num_hosts=num_hosts,
    )
    eval_data = make_dataset(
        cfg.data, cfg.data.dev_set, global_batch,
        accum=1, shuffle=False, seed=cfg.train.seed,
        host_id=host_id, num_hosts=num_hosts,
    )
    test_data = make_dataset(
        cfg.data, cfg.data.test_set, global_batch,
        accum=1, shuffle=False, seed=cfg.train.seed,
        host_id=host_id, num_hosts=num_hosts,
    )

    num_training_steps = max(1, cfg.train.num_epochs * len(train_data))
    tg, teacher_params = load_teacher_checkpoint(cfg)
    # the Distiller's TeacherModel is built from the CHECKPOINT geometry when
    # one was loaded (extractor spec/mode, pre- vs post-LN, pos-conv shape)
    distiller = Distiller(cfg, mesh=mesh, num_training_steps=num_training_steps,
                          teacher_geometry=tg)
    tg = distiller.teacher_geometry

    rng = jax.random.PRNGKey(cfg.train.seed)
    sample = train_data.first_batch()
    sample_wav = jnp.asarray(sample["x"][0])

    if teacher_params is None:
        teacher_params = distiller.init_teacher_params(rng, sample_wav)

    state = distiller.init_state(jax.random.fold_in(rng, 1), sample_wav)
    if cfg.distiller.init_conv_layers or cfg.distiller.init_encoder_layers > 0:
        from fithubert_tpu.models.surgery import init_student_from_teacher

        # hint-init BEFORE shard_teacher: the student's fp32 masters must
        # graft the teacher's full-precision weights, not the bf16-rounded
        # copies prepare_teacher_params stores for the frozen forward
        state = state.replace(
            params=init_student_from_teacher(
                jax.device_get(state.params),
                jax.device_get(teacher_params),
                cfg.distiller,
            )
        )
    teacher_params = distiller.shard_teacher(teacher_params)
    ckpt = CheckpointManager(os.path.join(out_dir, "ckpt"), cfg.train.save_top_k)

    def _ckpt_save(step_i: int, state, v_loss: float | None = None) -> None:
        """Persist the train state under any process/mesh topology.

        Single-host: pull to host memory and save (the historical path —
        everything is addressable). Multi-host: EVERY process passes the
        global on-device arrays straight to orbax's multi-process sharded
        save — under a model>1 mesh the TP shards on other hosts are not
        addressable here, so a host-0 `jax.device_get(state)` would raise
        (VERDICT r3 #4); orbax has each process write its own shards and
        host 0 commit. Requires the checkpoint directory on a shared
        filesystem, the standard multi-host TPU setup."""
        to_save = jax.device_get(state) if num_hosts == 1 else state
        if v_loss is None:
            ckpt.save_last(step_i, to_save)
        else:
            ckpt.save(step_i, to_save, v_loss)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(jax.device_get(state))
        if restored is not None:
            state = restored
            start_epoch = int(state.step) // max(1, len(train_data))
            print(f"[resume] restored step {int(state.step)} (epoch {start_epoch})")
    state = distiller.shard_state(state)

    train_step = distiller.make_train_step()
    steps_per_launch = max(1, cfg.train.steps_per_launch)
    chain_step = (
        distiller.make_train_step_chain() if steps_per_launch > 1 else None
    )
    eval_step = distiller.make_eval_step()
    task_specific = not cfg.distiller.teacher_task_agnostic
    predict_step = decoder = None
    if task_specific:
        from fithubert_tpu.utils.text import GreedyCTCDecoder

        decoder = GreedyCTCDecoder()
        predict_step = distiller.make_predict_step(len(decoder.dictionary))
    py_rng = random.Random(cfg.train.seed)
    from fithubert_tpu.utils.rng import root_step_key

    # dropout/specaug/layerdrop streams: rbg on TPU (utils/rng.py); init
    # keys above stay threefry (init reproducibility is test contract)
    step_rng = jax.random.fold_in(
        root_step_key(cfg.train.seed, cfg.train.rng_impl), 2
    )

    def _put_one(v, sharding, batch_axis):
        v = np.asarray(v)
        if num_hosts > 1:
            # per-host-different data onto a global mesh: device_put would
            # assert cross-process equality; assemble from local stripes
            gshape = list(v.shape)
            gshape[batch_axis] = v.shape[batch_axis] * num_hosts
            return jax.make_array_from_process_local_data(
                sharding, v, tuple(gshape)
            )
        return jax.device_put(jnp.asarray(v), sharding)

    def _put(batch):
        return {
            k: _put_one(v, batch_sh, 1)
            for k, v in batch.items()
            if not k.startswith("_")
        }

    def _prefetched(batches, depth=2):
        """Device-put `depth` batches ahead: device_put dispatches the H2D
        copy asynchronously, so the next batch streams in while the current
        step computes (the reference leans on DataLoader workers for the
        host half only; the device copy there is synchronous per step)."""
        import collections

        q = collections.deque()
        for batch in batches:
            q.append((batch, _put(batch)))
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()



    def run_eval(data, epoch: int, name: str, rand) -> float:
        # evaluate with the SAME random layer set the epoch trained on
        # (reference resamples only at training_epoch_end, train.py:172-174)
        totals: Dict[str, float] = {}
        n = 0
        refs, hyps = [], []
        for batch in data.epoch(epoch):
            eval_sh = NamedSharding(mesh, P("data"))
            transcripts = batch.get("_transcripts")
            b = {
                k: _put_one(np.asarray(v[0]), eval_sh, 0)
                for k, v in batch.items()
                if not k.startswith("_")
            }
            logs = eval_step(state, teacher_params, b, rand)
            for k, v in logs.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
            # WER/CER for task-specific teachers (reference train.py:188-207,
            # fixed — the reference never initializes its metrics, SURVEY.md §4)
            if predict_step is not None and transcripts:
                ids, _ = predict_step(state, b)
                if num_hosts > 1:
                    # the global array spans non-addressable devices; fetch
                    # THIS host's row stripe (sorted by global offset, which
                    # is how the local batch rows were laid out) and pair
                    # with its local transcripts
                    shards = sorted(
                        ids.addressable_shards, key=lambda s: s.index[0].start or 0
                    )
                    local_ids = np.concatenate([np.asarray(s.data) for s in shards])
                else:
                    local_ids = np.asarray(ids)
                for row_ids, ref in zip(local_ids, transcripts[0]):
                    hyps.append(decoder.decode(row_ids))
                    refs.append(ref)
        means = {k: v / max(n, 1) for k, v in totals.items()}
        if refs:
            from fithubert_tpu.utils.text import cer, wer

            if num_hosts > 1:
                # aggregate per-host partial error counts so every host
                # reports the same corpus-level WER/CER
                from jax.experimental import multihost_utils

                from fithubert_tpu.utils.text import edit_stats

                w_err, w_tot, c_err, c_tot = edit_stats(refs, hyps)
                agg = np.asarray(
                    multihost_utils.process_allgather(
                        np.asarray([w_err, w_tot, c_err, c_tot], np.float64)
                    )
                ).reshape(num_hosts, 4).sum(axis=0)
                means["wer"] = float(agg[0] / max(agg[1], 1.0))
                means["cer"] = float(agg[2] / max(agg[3], 1.0))
            else:
                means["wer"] = wer(refs, hyps)
                means["cer"] = cer(refs, hyps)
        logger.log(int(state.step), means, prefix=f"{name}/")
        return means.get("v_loss", float("inf"))

    def _sample_rand():
        return jnp.asarray(
            _sample_rand_layers(py_rng, cfg)
            if cfg.loss.distil_random_layer > 0
            else np.zeros((0,), np.int32)
        )

    if test_only:
        v = run_eval(test_data, 0, "test", _sample_rand())
        print(f"[test] loss {v:.4f}")
        return {"test_loss": v}

    best_v = float("inf")
    epochs_no_improve = 0
    global_step = int(state.step)
    stop = False
    guard = PreemptionGuard()

    from fithubert_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer(sync_every=cfg.train.log_every)
    prof_start = global_step + 2  # skip compile steps
    prof_stop = prof_start + cfg.train.profile_steps
    profiler_ctx = None

    def _sync_flag(flag: bool) -> bool:
        """Multi-host: every process must take IDENTICAL break decisions or
        the others deadlock in the next collective. OR the local flag across
        hosts (checked at log_every boundaries to bound DCN traffic — the
        preemption grace window must cover log_every steps)."""
        if num_hosts == 1:
            return flag
        from jax.experimental import multihost_utils

        return bool(
            np.asarray(
                multihost_utils.process_allgather(np.asarray(flag))
            ).any()
        )


    for epoch in range(start_epoch, cfg.train.num_epochs):
        rand = _sample_rand()
        for run in _launch_groups(
            _prefetched(train_data.epoch(epoch)), steps_per_launch
        ):
            k = len(run)
            if (cfg.train.profile_steps > 0 and profiler_ctx is None
                    and prof_start <= global_step < prof_stop):
                profiler_ctx = trace(os.path.join(out_dir, "trace"))
                profiler_ctx.__enter__()
            if _use_chain(k, steps_per_launch) and chain_step is not None:
                # one launch, k optimizer steps (train.steps_per_launch):
                # stack the same-shape device batches and scan over them
                stacked = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[dev for _raw, dev in run]
                )
                state, logs_k = chain_step(
                    state, teacher_params, stacked, rand, step_rng
                )
                logs = jax.tree.map(lambda v: v[-1], logs_k)
            else:
                for _raw, dev in run:
                    state, logs = train_step(
                        state, teacher_params, dev, rand, step_rng
                    )
            global_step += k
            if profiler_ctx is not None and global_step >= prof_stop:
                jax.block_until_ready(state.params)
                profiler_ctx.__exit__(None, None, None)
                profiler_ctx = None
            audio_sec = sum(
                float(np.sum(~raw["padding_mask"])) for raw, _dev in run
            ) / 16000.0
            rates = timer.tick(sync_target=logs["loss"], audio_sec=audio_sec,
                               steps=k)
            # boundary crossed iff some sub-step in this launch hit a
            # log_every multiple (k == 1 reduces to the plain % check)
            log_boundary = (global_step % cfg.train.log_every) < k
            if cfg.train.monitor_losses and log_boundary:
                logs = jax.device_get(logs)
                logs.update(rates)
                logger.log(global_step, logs)
            check_stop = num_hosts == 1 or log_boundary
            if check_stop and _sync_flag(guard.should_stop):
                guard.should_stop = True  # a peer host was preempted
                # last/ only: a preemption snapshot has no v_loss and must
                # not occupy a best/ slot (VERDICT r2 weak #5); all hosts
                # participate (sharded save), host 0 reports
                _ckpt_save(global_step, state)
                ckpt.wait()
                if host_id == 0:
                    print(f"[preemption] checkpointed step {global_step}; exiting")
                stop = True
                break
            if cfg.train.max_steps and global_step >= cfg.train.max_steps:
                stop = True
                break

        if stop and guard.should_stop:
            break
        # v_loss comes from replicated outputs of globally-sharded eval
        # steps: already identical on every host, so early-stop branches
        # identically with no extra sync
        v_loss = run_eval(eval_data, epoch, "val", rand)
        _ckpt_save(global_step, state, v_loss)
        if v_loss < best_v:
            best_v = v_loss
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1
            if epochs_no_improve >= cfg.train.early_stop_patience:
                print(f"[early-stop] no v_loss improvement in "
                      f"{cfg.train.early_stop_patience} epochs")
                stop = True
        if stop:
            break

    if profiler_ctx is not None:
        profiler_ctx.__exit__(None, None, None)
    guard.restore()
    ckpt.wait()
    if num_hosts > 1:
        # the export pair is a host-side msgpack: gather any cross-process
        # (TP) shards to every host first — a collective, so ALL hosts call
        # it — then host 0 alone writes
        from jax.experimental import multihost_utils

        # tiled=True: required for TP-sharded (non-fully-addressable) arrays,
        # and returns replicated arrays unchanged
        export_params = multihost_utils.process_allgather(
            state.params, tiled=True)
        export_extra = (
            multihost_utils.process_allgather(state.extra_vars, tiled=True)
            if state.extra_vars else state.extra_vars
        )
    else:
        export_params, export_extra = state.params, state.extra_vars
    if host_id == 0:
        export_student(cfg, export_params, out_dir, tag="student",
                       extra_vars=export_extra)
    logger.close()
    return {"best_v_loss": best_v, "steps": global_step,
            "preempted": guard.should_stop}
