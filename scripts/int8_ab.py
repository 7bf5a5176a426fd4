#!/usr/bin/env python
"""On-chip A/B of the int8 teacher (`teacher.quantize_int8`, ops/quant.py).

VERDICT r3 #2: the int8 path had never executed on its target hardware.
As of round 5 the teacher's Dense kernels are PRE-quantized once in
prepare_teacher_params (int8 leaves + per-channel fp32 scales; only
activations quantize per step) — the r4 capture of this script (1.012x,
artifacts/int8_ab_v5e_2026-08-19.json) ran with per-step dynamic weight
quantization over ~95M frozen weights (VERDICT r4 weak #1).
This script measures, on the real chip, at the fithubert.yaml config of
record (batch 3 x accum 4, 12 s utterances, bf16 compute):

  a. that the s8xs8->s32 dot_general lowering COMPILES at the teacher
     shapes (a failed compile aborts the run loudly);
  b. kd_train_step steps/s with the int8 teacher vs the bf16 teacher
     (expected ceiling: teacher matmuls are ~21 ms of the 74 ms step);
  c. quantization error on the distillation targets: per-layer cosine
     similarity of teacher hiddens (int8 vs bf16) and the loss delta of one
     deterministic eval step at identical student params.

Teacher/student weights are REAL on-device random inits (not zeros): the
quantization error depends on weight/activation distributions, so the
timing-only zeros shortcut from bench.py would make (c) meaningless. No
released checkpoint exists in this environment; per-channel scales make the
error largely distribution-shape- (not value-) driven, so random-init error
is representative.

Prints one JSON line. Timing uses the watchdogged fetch barrier
(utils/barrier.py); any degradation marks the output untrusted.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — _make_sync + the soft-fail backend acquisition

SR = 16_000


def _build(cfg, int8: bool):
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller

    tg = dataclasses.replace(
        TeacherGeometry.from_teacher_config(cfg.teacher),
        compute_dtype="bfloat16", quantize_int8=int8,
    )
    return Distiller(cfg, num_training_steps=1000, teacher_geometry=tg), tg


def _time_train(distiller, state, tp, batch, rand, rng, sync, iters=10):
    step = distiller.make_train_step()
    state, logs = step(state, tp, batch, rand, rng)
    sync(logs["loss"])
    state, logs = step(state, tp, batch, rand, rng)
    sync(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, tp, batch, rand, rng)
    sync(logs["loss"])
    return iters / (time.perf_counter() - t0), state


def main():
    import jax

    if "--cpu" in sys.argv:  # axon overrides JAX_PLATFORMS from the shell
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    platform, kind = bench._acquire_backend(metric="int8_teacher_ab")
    quick = "--quick" in sys.argv
    if platform == "cpu" and not quick:
        print(json.dumps({"error": "int8 A/B targets the TPU; pass --quick "
                          "for a CPU smoke", "untrusted": True}))
        return

    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.utils.rng import root_step_key

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml"))
    if quick:
        cfg = dataclasses.replace(
            cfg,
            distiller=dataclasses.replace(cfg.distiller, encoder_layers=2),
            teacher=dataclasses.replace(cfg.teacher, encoder_layers=2),
            loss=dataclasses.replace(cfg.loss, distil_random_layer=1),
        )
        b, accum, wav_sec, iters = 1, 2, 2.0, 2
    else:
        b, accum, wav_sec, iters = (cfg.train.batch_size,
                                    cfg.train.accumulate_grad_batches, 12.0, 10)
    t_wav = int(wav_sec * SR)

    d_bf16, tg_bf16 = _build(cfg, int8=False)
    d_int8, tg_int8 = _build(cfg, int8=True)

    # REAL random inits, shared by both arms (init at a short wav — params
    # are length-independent; full-length init compiles take minutes)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 16 * 320), jnp.float32)
    teacher_params = jax.device_get(d_bf16.init_teacher_params(rng, small))
    tp_bf16 = d_bf16.shard_teacher(teacher_params)
    tp_int8 = d_int8.shard_teacher(teacher_params)
    # host copy: the train step DONATES its state, and shard_state of an
    # on-device array is an alias, so each arm must re-shard from host
    state0 = jax.device_get(d_bf16.init_state(jax.random.fold_in(rng, 1), small))

    np_rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(np_rng.standard_normal((accum, b, t_wav)) * 0.1,
                         jnp.float32),
        "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool),
    }
    rand = jnp.arange(max(1, cfg.loss.distil_random_layer), dtype=jnp.int32)
    step_rng = root_step_key(0)

    sync, fetch_ok = bench._make_sync()
    out = {"metric": "int8_teacher_ab", "device_kind": kind,
           "geometry": "fithubert.yaml" if not quick else "smoke"}

    # (c1) per-layer teacher-hidden cosine, int8 vs bf16, same wav ---------
    def hiddens_fn(distiller):
        @jax.jit
        def hiddens(tparams, wav):
            o = distiller.teacher.apply(
                tparams, wav, jnp.zeros(wav.shape, bool), need_taps=False)
            return jnp.stack([h for (h, _, _) in o.layer_results], axis=0)

        return hiddens

    h_b = np.asarray(jax.device_get(
        hiddens_fn(d_bf16)(tp_bf16, batch["x"][0]))).astype(np.float64)
    h_q = np.asarray(jax.device_get(
        hiddens_fn(d_int8)(tp_int8, batch["x"][0]))).astype(np.float64)
    dots = (h_b * h_q).sum(axis=(-1, -2, -3))
    cos = dots / np.maximum(
        np.linalg.norm(h_b.reshape(h_b.shape[0], -1), axis=1)
        * np.linalg.norm(h_q.reshape(h_q.shape[0], -1), axis=1), 1e-30)
    out["per_layer_cosine_min"] = round(float(cos.min()), 6)
    out["per_layer_cosine"] = [round(float(c), 6) for c in cos]

    # (c2) eval-step loss delta at identical student params ----------------
    eval_b = {"x": batch["x"][0], "padding_mask": batch["padding_mask"][0]}
    st_sh = d_bf16.shard_state(state0)
    l_b = float(np.asarray(jax.device_get(
        d_bf16.make_eval_step()(st_sh, tp_bf16, eval_b, rand)["v_loss"])))
    l_q = float(np.asarray(jax.device_get(
        d_int8.make_eval_step()(st_sh, tp_int8, eval_b, rand)["v_loss"])))
    out["eval_loss_bf16"] = round(l_b, 6)
    out["eval_loss_int8"] = round(l_q, 6)
    out["eval_loss_rel_delta"] = round(abs(l_q - l_b) / max(abs(l_b), 1e-12), 6)

    # (b) steps/s A/B -------------------------------------------------------
    sps_b, _ = _time_train(d_bf16, d_bf16.shard_state(state0), tp_bf16,
                           batch, rand, step_rng, sync, iters)
    sps_q, _ = _time_train(d_int8, d_int8.shard_state(state0), tp_int8,
                           batch, rand, step_rng, sync, iters)
    out["steps_per_sec_bf16"] = round(sps_b, 3)
    out["steps_per_sec_int8"] = round(sps_q, 3)
    out["int8_speedup"] = round(sps_q / sps_b, 4)
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    out["untrusted"] = not out["fetch_ok"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
