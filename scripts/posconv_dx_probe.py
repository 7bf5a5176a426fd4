#!/usr/bin/env python
"""Probe the pos-conv input-grad orientation fold (round-5 follow-up).

grouped_conv_same's custom VJP (ops/conv.py:_gc_bwd) rewrites the input-grad
as a FORWARD grouped conv by flipping the kernel in k — but the TPU HLO shows
the algebraic simplifier folds that `reverse` straight back into the
convolution as `window={... rhs_reversal=1x0}`, i.e. the slow transposed
orientation the rewrite was meant to avoid (the r4 trace priced it at 4.94M
cycles vs the shape-identical forward's 1.26M; fusion.4742 = 3.30 ms vs
fusion.4740 = 1.78 ms in artifacts/step_trace_r5.txt). An
`optimization_barrier` on the flipped kernel (3.5 MB — the materialized
reverse is noise) blocks the fold: the compiled window loses `rhs_reversal`
and matches the forward's orientation.

Measures, two-point (CLAUDE.md timing discipline), at the student release
shape (12, 600, 480) bf16, g=16, k=128:

  fwd       — the forward conv (reference point, ~1.78 ms in-step)
  dx_folded — the current backward (flip folded back to rhs_reversal)
  dx_barrier— flip + optimization_barrier (plain forward orientation)

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    import jax
    import jax.numpy as jnp

    platform, kind = bench._acquire_backend(metric="posconv_dx_probe")
    from fithubert_tpu.ops.conv import _conv_dn

    k, g, cg = 128, 16, 30
    C = g * cg
    pad = (64, 63)  # SamePad for even k: layer emits T frames from T
    B, T = 12, 600

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, T, C), jnp.bfloat16) * 0.1
    kern = jax.random.normal(jax.random.fold_in(rng, 1), (k, cg, C),
                             jnp.bfloat16) * 0.02

    def fwd(y, w):
        return jax.lax.conv_general_dilated(
            y, w, window_strides=(1,), padding=[pad],
            dimension_numbers=_conv_dn(), feature_group_count=g)

    def flip_kernel(w):
        w4 = w.reshape(k, cg, g, cg)
        return jnp.flip(w4, 0).transpose(0, 3, 2, 1).reshape(k, cg, g * cg)

    def dx_conv(y, wt):
        return jax.lax.conv_general_dilated(
            y, wt, window_strides=(1,),
            padding=[(k - 1 - pad[0], k - 1 - pad[1])],
            dimension_numbers=_conv_dn(), feature_group_count=g)

    def dx_folded(y, w):
        return dx_conv(y, flip_kernel(w))

    def dx_barrier(y, w):
        return dx_conv(y, jax.lax.optimization_barrier(flip_kernel(w)))

    sync, fetch_ok = bench._make_sync()
    out = {"metric": "posconv_dx_probe", "device_kind": kind,
           "shape": [B, T, C], "k": k, "groups": g}

    def measure(conv_fn, tag, k1=8, k2=32, reps=3):
        # chain conv(carry) so the loop body cannot be constant-folded
        # (CLAUDE.md: loop-invariant operands fold); the kernel IS
        # loop-invariant, matching the real step (one flip per step)
        runs = {}
        for n in (k1, k2):
            @jax.jit
            def run(y, w, _n=n):
                return jax.lax.fori_loop(
                    0, _n, lambda i, c: conv_fn(c, w) * 0.5 + 1e-3, y)

            sync(run(x0, kern).ravel()[0])  # compile + warm
            runs[n] = run
        per = []
        for _ in range(reps):
            ts = {}
            for n in (k1, k2):
                t0 = time.perf_counter()
                sync(runs[n](x0, kern).ravel()[0])
                ts[n] = time.perf_counter() - t0
            per.append((ts[k2] - ts[k1]) / (k2 - k1))
        out[f"ms_per_call_{tag}"] = round(min(per) * 1000, 3)

    measure(fwd, "fwd")
    measure(dx_folded, "dx_folded")
    measure(dx_barrier, "dx_barrier")

    # numeric identity: the barrier is an identity op; both orientations
    # must produce the same dx up to conv reassociation (expect tiny/zero)
    a = dx_folded(x0, kern)
    b = dx_barrier(x0, kern)
    rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9))
    out["folded_vs_barrier_max_rel"] = round(rel, 8)
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
