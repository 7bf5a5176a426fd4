#!/usr/bin/env python
"""Capture an on-TPU xplane trace of the full KD train step and print the
HLO-op time breakdown (total by category + top self-time ops).

The MFU roofline (scripts/mfu_roofline.py, README "MFU roofline") bounds the
step from measured STANDALONE matmul rates; this script attributes the
measured step from the other direction — the profiler's per-op device times —
so the ~34 ms of "non-matmul glue" between the 50.7 ms light-speed bound and
the 85 ms step stops being a residual and becomes named ops.

Usage:
  python scripts/step_trace.py                  # capture on TPU + parse
  python scripts/step_trace.py --parse-only     # re-parse the last capture
  python scripts/step_trace.py --logdir DIR --steps 5 --top 40

Parsing uses xprof (baked into this image; tensorboard_plugin_profile's
copy has a protobuf-version conflict). Capture needs the real chip; parse
runs anywhere.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args) -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import SR, _zeros_like_shapes
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller
    from fithubert_tpu.utils.barrier import fetch_barrier, probe_fetch
    from fithubert_tpu.utils.rng import root_step_key

    if jax.devices()[0].platform != "tpu":
        sys.exit("capture needs the real TPU; use --parse-only off-chip")
    # Warm the fetch path first with a generous budget — the FIRST fetch
    # after backend init takes minutes over a cold tunnel (bench.py does the
    # same; without it a purely transient cold start fails the health probe)
    probe_fetch(timeout=float(os.environ.get(
        "FITHUBERT_BENCH_WARM_TIMEOUT", "600")))
    if not probe_fetch(timeout=60.0):
        sys.exit("device->host fetch probe failed; refusing to trace "
                 "(the tunnel is wedged — results would be untimeable)")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml"))
    teacher_geom = dataclasses.replace(
        TeacherGeometry.from_teacher_config(cfg.teacher),
        compute_dtype="bfloat16",
    )
    b, accum, wav_sec = (cfg.train.batch_size,
                         cfg.train.accumulate_grad_batches, 12.0)
    t_wav = int(wav_sec * SR)

    distiller = Distiller(cfg, num_training_steps=1000,
                          teacher_geometry=teacher_geom)
    rng = jax.random.PRNGKey(0)
    sample_wav = jnp.zeros((b, t_wav), jnp.float32)
    # prepare_teacher_params matches production: bf16-stored teacher matmul
    # weights (bench.py and run_training both trace THIS step shape)
    teacher_params = distiller.prepare_teacher_params(_zeros_like_shapes(
        jax.eval_shape(distiller.init_teacher_params, rng, sample_wav)))
    state = _zeros_like_shapes(
        jax.eval_shape(distiller.init_state, rng, sample_wav))

    np_rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(
            np_rng.standard_normal((accum, b, t_wav)) * 0.1, jnp.float32),
        "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool),
    }
    rand_layers = jnp.arange(
        max(1, cfg.loss.distil_random_layer), dtype=jnp.int32)
    rng = root_step_key(0)

    step = distiller.make_train_step()
    for _ in range(2):  # compile + settle
        state, logs = step(state, teacher_params, batch, rand_layers, rng)
        fetch_barrier(logs["loss"])

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, logs = step(state, teacher_params, batch, rand_layers, rng)
        fetch_barrier(logs["loss"])
    print(f"# trace captured: {args.logdir} ({args.steps} steps)")


def _gviz_rows(data) -> tuple[list[str], list[list]]:
    obj = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in obj["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in obj["rows"]]
    return cols, rows


def parse(args) -> None:
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        sys.exit(f"no .xplane.pb under {args.logdir}")
    path = paths[-1]
    print(f"# parsing {path}")

    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    cols, rows = _gviz_rows(data)
    i = {name: idx for idx, name in enumerate(cols)}

    def col(row, *names, default=0.0):
        for n in names:
            if n in i and row[i[n]] is not None:
                return row[i[n]]
        return default

    per_cat = defaultdict(float)
    ops = []
    for r in rows:
        cat = col(r, "category", default="?")
        self_us = float(col(r, "total_self_time_us", "self_time_us",
                            "total_self_time"))
        occ = int(col(r, "occurrences", default=0))
        name = str(col(r, "hlo_op_name", default="?"))
        expr = str(col(r, "hlo_op_expression", default=""))
        per_cat[cat] += self_us
        ops.append((self_us, occ, cat, name, expr))

    total = sum(per_cat.values())
    n_steps = args.steps
    print(f"\n== device self-time by HLO category "
          f"(total {total/1e3:.2f} ms / {n_steps} steps "
          f"= {total/1e3/n_steps:.2f} ms/step) ==")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3/n_steps:8.3f} ms/step  {100*us/total:5.1f}%  {cat}")

    print(f"\n== top {args.top} ops by self time (per step) ==")
    ops.sort(key=lambda t: -t[0])
    for self_us, occ, cat, name, expr in ops[:args.top]:
        print(f"  {self_us/1e3/n_steps:8.3f} ms  x{occ:<4d} [{cat}] {name}")
        if args.expr:
            print(f"      {expr[:240]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/kd_step_trace")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--expr", action="store_true",
                    help="print each top op's HLO expression")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args)
    parse(args)


if __name__ == "__main__":
    main()
