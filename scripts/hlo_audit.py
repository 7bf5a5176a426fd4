#!/usr/bin/env python
"""Audit the COMPILED train-step HLO for slow-orientation convolutions.

Round-5 lesson (CLAUDE.md "pos-conv dx orientation fix"): XLA:TPU's algebraic
simplifier can fold an explicit kernel flip BACK into a convolution as window
`rhs_reversal` — the transposed orientation that runs ~4x slower than the
shape-identical forward conv — silently undoing a custom-VJP rewrite that
only ever existed in the jaxpr. The honest check is the optimized HLO, not
the jaxpr. This script compiles the full fused KD train step exactly as
bench.py/step_trace.py trace it and reports every convolution whose window
carries `rhs_reversal=` (plus totals for dilated/strided grads), so any
regression of that fold — or another conv riding the slow path — is caught
by reading one report instead of re-deriving cycle counts from a trace.

Exit code 1 iff a conv in the ALARM class (stride-1 big-kernel rhs_reversal —
the pos-conv regression) is present; expected grad forms (XLA's canonical
strided-conv input-grad, weight-grads, tiny k<=3 windows) are listed but fine.

Usage:
  python scripts/hlo_audit.py                 # compile for default backend
  python scripts/hlo_audit.py --platform cpu  # audit the CPU lowering
  python scripts/hlo_audit.py --out FILE      # also save the full HLO text
  python scripts/hlo_audit.py --from FILE     # re-audit saved HLO, no compile
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import SR, _zeros_like_shapes
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller
    from fithubert_tpu.utils.rng import root_step_key

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml"))
    teacher_geom = dataclasses.replace(
        TeacherGeometry.from_teacher_config(cfg.teacher),
        compute_dtype="bfloat16",
    )
    b, accum = cfg.train.batch_size, cfg.train.accumulate_grad_batches
    t_wav = int(12.0 * SR)

    distiller = Distiller(cfg, num_training_steps=1000,
                          teacher_geometry=teacher_geom)
    rng = jax.random.PRNGKey(0)
    sample_wav = jnp.zeros((b, t_wav), jnp.float32)
    teacher_params = distiller.prepare_teacher_params(_zeros_like_shapes(
        jax.eval_shape(distiller.init_teacher_params, rng, sample_wav)))
    state = _zeros_like_shapes(
        jax.eval_shape(distiller.init_state, rng, sample_wav))
    batch = {
        "x": jnp.zeros((accum, b, t_wav), jnp.float32),
        "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool),
    }
    rand_layers = jnp.arange(
        max(1, cfg.loss.distil_random_layer), dtype=jnp.int32)
    step = distiller.make_train_step()
    args = (state, teacher_params, batch, rand_layers, root_step_key(0))
    return step, args


_CONV_RE = re.compile(r"^\s*(%?[\w.-]+) = \S+ convolution\(.*", re.M)


def _classify_reversal(window: str) -> str:
    """Classify an rhs_reversal convolution by its window config.

    Two rhs_reversal forms are expected and fine (audited on-chip r5,
    artifacts/hlo_train_step_tpu_r5.txt):
      - 'dx-strided': input-grad of a strided conv — XLA's canonical VJP
        emits lhs_dilate=stride + rhs_reversal (the conv front-end's
        FITHUBERT_CONV_BWD=xla default, measured FASTER than our Pallas
        backward). Signature: some lhs_dilate factor > 1.
      - 'dw': weight-grad — window size spans the time axis (hundreds of
        frames, e.g. size=599x16 emitting the kernel-shaped [128,30,16,30]).
        Signature: any window size dim > _DW_SIZE_MIN.
    The ALARM class is 'dx-stride1-bigk': a stride-1 no-dilate conv with a
    large kernel running reversed — the pos-conv transposed orientation
    (~4x slower than its forward twin) that XLA:TPU's simplifier re-folds
    unless ops/conv.py:_gc_bwd's optimization_barrier blocks it.
    """
    sizes = []
    m = re.search(r"size=([0-9x]+)", window)
    if m:
        sizes = [int(s) for s in m.group(1).split("x")]
    dil = re.search(r"lhs_dilate=([0-9x]+)", window)
    if dil and any(int(d) > 1 for d in dil.group(1).split("x")):
        # dw also carries lhs_dilate sometimes; the long-window check wins.
        if sizes and max(sizes) > _DW_SIZE_MIN:
            return "dw"
        return "dx-strided"
    if sizes and max(sizes) > _DW_SIZE_MIN:
        return "dw"
    if sizes and max(sizes) >= _BIGK_MIN:
        return "dx-stride1-bigk"  # the pos-conv regression class
    return "small"  # tiny reversed windows (k<=3 TR/head glue): negligible


_DW_SIZE_MIN = 256  # frames; release time axes are >=299, kernels <=128
_BIGK_MIN = 16      # k=128 pos conv is the only stride-1 big-k conv we run


def audit(hlo: str) -> dict:
    """Parse optimized-HLO text; classify every convolution's window."""
    convs = []
    for line in hlo.splitlines():
        if " convolution(" not in line:
            continue
        name = line.strip().split(" ", 1)[0]
        window = ""
        m = re.search(r"window=\{([^}]*)\}", line)
        if m:
            window = m.group(1)
        shape = ""
        sm = re.search(r"= ((?:\w+\[[^\]]*\]|\([^)]*\)))", line)
        if sm:
            shape = sm.group(1)
        rm = re.search(r"rhs_reversal=([0-9x]+)", window)
        rev = bool(rm) and "1" in rm.group(1)  # any dim actually reversed
        convs.append({
            "name": name,
            "shape": shape,
            "window": window,
            "rhs_reversal": rev,
            "reversal_class": _classify_reversal(window) if rev else "",
            "lhs_dilate": "lhs_dilate" in window,
            "rhs_dilate": "rhs_dilate" in window,
        })
    alarms = [c for c in convs if c["reversal_class"] == "dx-stride1-bigk"]
    return {
        "n_convs": len(convs),
        "n_rhs_reversal": sum(c["rhs_reversal"] for c in convs),
        "n_lhs_dilate": sum(c["lhs_dilate"] for c in convs),
        "n_alarm": len(alarms),
        "alarms": alarms,
        "convs": convs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="pin jax platform (e.g. cpu) before backend init")
    ap.add_argument("--out", default=None, help="save full HLO text here")
    ap.add_argument("--from", dest="from_file", default=None,
                    help="audit saved optimized-HLO text instead of compiling")
    args = ap.parse_args()

    if args.from_file:
        with open(args.from_file) as f:
            hlo = f.read()
        print(f"# auditing saved HLO: {args.from_file} ({len(hlo)} bytes)")
    else:
        if args.platform:
            import jax
            jax.config.update("jax_platforms", args.platform)

        from fithubert_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()

        step, step_args = build_step()
        import jax
        print(f"# backend: {jax.devices()[0].platform}; lowering + compiling "
              "(TPU remote compile ~75-90 s uncached) ...", flush=True)
        compiled = jax.jit(step).lower(*step_args).compile()
        hlo = compiled.as_text()
    if args.out and not args.from_file:
        with open(args.out, "w") as f:
            f.write(hlo)
        print(f"# full optimized HLO -> {args.out} ({len(hlo)} bytes)")

    rep = audit(hlo)
    print(f"convolutions: {rep['n_convs']}  "
          f"rhs_reversal: {rep['n_rhs_reversal']}  "
          f"lhs_dilate(grad-style): {rep['n_lhs_dilate']}  "
          f"ALARMS: {rep['n_alarm']}")
    for c in rep["convs"]:
        flags = []
        if c["rhs_reversal"]:
            flags.append(f"RHS_REVERSAL[{c['reversal_class']}]")
        if c["lhs_dilate"]:
            flags.append("lhs_dilate")
        if c["rhs_dilate"]:
            flags.append("rhs_dilate")
        print(f"  {c['name']:<40} {c['shape']:<40} "
              f"window[{c['window'][:80]}] {' '.join(flags)}")
    if rep["n_alarm"]:
        print("\n!! ALARM: stride-1 big-kernel rhs_reversal convolution(s) — "
              "the pos-conv transposed orientation is back (see CLAUDE.md "
              "pos-conv dx orientation fix; ops/conv.py:_gc_bwd barrier):")
        for c in rep["alarms"]:
            print(f"   {c['name']} {c['shape']} window[{c['window']}]")
        sys.exit(1)
    if rep["n_rhs_reversal"]:
        print("\n# remaining rhs_reversal convs are expected grad forms "
              "(dx-strided = XLA's canonical strided-conv input-grad, "
              "dw = weight-grad, small = k<=3 glue) — audited on-chip r5.")


if __name__ == "__main__":
    main()
