#!/usr/bin/env python
"""Does the strided conv-stack input-grad pay the same reversal penalty the
pos-conv dx did (scripts/posconv_dx_probe.py)?

XLA's own VJP for a strided conv emits dx as conv(dy, w) with
lhs_dilation=stride and window rhs_reversal. The pos-conv probe showed the
TPU emitter runs an rhs-reversed conv ~1.8x slower than the plain
orientation at k=128 g=16; this probe asks whether the dense k=3 s=2
feature-extractor convs (fusion.19 etc., ~1.2 ms each in the step trace)
leave anything on the table: variant `xla` is jax.vjp of the forward;
variant `manual` computes dx explicitly as a forward conv over dy with
lhs_dilation and a pre-flipped, optimization_barrier'd kernel.

Shape: conv_1 of the student stack — (12, 38944, 256) -> (12, 19471, 256),
k=3 s=2 VALID, bf16. Prints one JSON line.
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

    platform, kind = bench._acquire_backend(metric="convstack_dx_probe")
    from fithubert_tpu.ops.conv import _conv_dn

    B, T, C = 12, 38944, 256
    k, s = 3, 2
    T_out = (T - k) // s + 1

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, T, C), jnp.bfloat16) * 0.1
    dy0 = jax.random.normal(jax.random.fold_in(rng, 2), (B, T_out, C),
                            jnp.bfloat16) * 0.1
    kern = jax.random.normal(jax.random.fold_in(rng, 1), (k, C, C),
                             jnp.bfloat16) * 0.05

    def fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(s,), padding=[(0, 0)],
            dimension_numbers=_conv_dn())

    def dx_xla(dy, w):
        _, vjp = jax.vjp(lambda x_: fwd(x_, w), x0)
        (dx,) = vjp(dy)
        return dx

    def dx_manual(dy, w):
        # dx[t] = sum_{k'} dy_dilated[t + k' - (k-1)] W[k-1-k']^T:
        # forward conv over stride-dilated dy with the k-flipped,
        # in/out-transposed kernel; barrier blocks the rhs_reversal re-fold
        wt = jnp.flip(w, 0).transpose(0, 2, 1)
        wt = jax.lax.optimization_barrier(wt.astype(dy.dtype))
        return jax.lax.conv_general_dilated(
            dy, wt, window_strides=(1,), padding=[(k - 1, T - 1 - s * (T_out - 1))],
            lhs_dilation=(s,), dimension_numbers=_conv_dn())

    sync, fetch_ok = bench._make_sync()
    out = {"metric": "convstack_dx_probe", "device_kind": kind,
           "shape": [B, T, C], "k": k, "stride": s}

    # parity first (cheap): identical math expected up to reassociation
    a = jax.jit(dx_xla)(dy0, kern)
    bman = jax.jit(dx_manual)(dy0, kern)
    rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bman.astype(jnp.float32)))
                / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9))
    out["manual_vs_xla_max_rel"] = round(rel, 8)

    def measure(fn, tag, k1=8, k2=32, reps=3):
        # dy -> dx has a different shape, so chain via a cheap re-slice:
        # feed dx (B,T,C) back through a strided slice to dy's shape — the
        # slice cost is identical across variants and cancels in the A/B
        def body(i, c):
            dx = fn(c, kern)
            return jax.lax.slice(dx, (0, 0, 0), (B, s * T_out, C),
                                 (1, s, 1)) * 0.5 + 1e-3

        runs = {}
        for n in (k1, k2):
            @jax.jit
            def run(c, _n=n):
                return jax.lax.fori_loop(0, _n, body, c)

            sync(run(dy0).ravel()[0])
            runs[n] = run
        per = []
        for _ in range(reps):
            ts = {}
            for n in (k1, k2):
                t0 = time.perf_counter()
                sync(runs[n](dy0).ravel()[0])
                ts[n] = time.perf_counter() - t0
            per.append((ts[k2] - ts[k1]) / (k2 - k1))
        out[f"ms_per_call_{tag}"] = round(min(per) * 1000, 3)

    measure(dx_xla, "xla")
    measure(dx_manual, "manual")
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
