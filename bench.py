#!/usr/bin/env python
"""Benchmark: student forward throughput on the FitHuBERT-960h geometry.

Prints ONE JSON line:
  {"metric": "student_fwd_audio_sec_per_sec_per_chip", "value": N,
   "unit": "audio-sec/sec/chip", "vs_baseline": N}

The north-star target (BASELINE.md) is >= 2000x real-time audio-sec/sec/chip
for the student forward pass; `vs_baseline` is value / 2000. Runs bf16 on the
first available device (TPU under the driver; CPU locally with smaller load).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import StudentModel

    platform = jax.devices()[0].platform
    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml")).distiller
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    model = StudentModel(cfg=cfg)

    import sys

    sr = 16_000
    if "--quick" in sys.argv:
        b, wav_sec, iters = 1, 2.0, 2
    elif platform == "tpu":
        b, wav_sec, iters = 32, 16.0, 30
    else:  # CPU smoke sizing
        b, wav_sec, iters = 2, 4.0, 3
    t_wav = int(wav_sec * sr)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((b, t_wav)), jnp.float32)
    mask = jnp.zeros((b, t_wav), dtype=bool)

    # abstract init + zero params: throughput doesn't depend on weight values,
    # and this avoids a minutes-long on-device init compile at batch shape
    small_wav = jnp.zeros((1, 16 * 320), jnp.float32)
    small_mask = jnp.zeros((1, 16 * 320), bool)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), small_wav, small_mask
    )["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def fwd(params, wav, mask):
        return model.apply({"params": params}, wav, mask, deterministic=True).x

    # On the tunneled single-chip platform block_until_ready alone can return
    # before execution finishes (inflating numbers), but device_get can also
    # hang entirely if the tunnel's fetch path is down. Probe once with a
    # watchdog; use the strong barrier only if fetches actually complete.
    import threading

    def _probe_fetch() -> bool:
        done = []

        def run():
            np.asarray(jax.device_get(jnp.zeros((1,))))
            done.append(True)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout=60.0)
        return bool(done)

    fetch_ok = _probe_fetch()

    def sync(x):
        jax.block_until_ready(x)
        if fetch_ok:
            np.asarray(jax.device_get(x[0, 0, :1]))

    # warmup / compile
    sync(fwd(params, wav, mask))
    sync(fwd(params, wav, mask))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, wav, mask)
    sync(out)
    dt = time.perf_counter() - t0

    audio_sec = b * wav_sec * iters
    value = audio_sec / dt
    target = 2000.0
    print(json.dumps({
        "metric": "student_fwd_audio_sec_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / target, 4),
    }))


if __name__ == "__main__":
    main()
