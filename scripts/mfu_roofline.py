#!/usr/bin/env python
"""MFU roofline for the KD train step (VERDICT r2 #8): measure, per matmul
class of the fithubert.yaml step, the BEST standalone rate the chip gives
that exact shape — then compose the light-speed step time.

"MFU 0.19" by itself says nothing about headroom: peak FLOP/s assumes
128x128-lane-saturating matmuls, which this geometry cannot produce — the
student attends with d_head=40 (pads to 128 lanes in QK^T/PV), the FFN is
480-wide (3.75 of a 128 tile), and 15% of the FLOPs are strided convs over
raw audio. The honest bound is:

    light_speed_ms = sum_i  flops_i / standalone_rate_i  (+ measured
                     optimizer + an HBM-bandwidth floor for the loss/norms)

where standalone_rate_i is MEASURED on-chip for each (shape, dtype) with
nothing else running — the rate the step could only reach if every op hit
its solo speed with zero gaps. mfu_bound = analytic_flops / light_speed.

Run on TPU: python scripts/mfu_roofline.py          (~2 min, jit compiles)
Prints one JSON line per component and a final summary line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16_000
B = 12           # batch 3 x accum 4, fused (train.fuse_grad_accum)
WAV_SEC = 12.0
T_WAV = int(WAV_SEC * SR)
T_FRAMES = 599   # conv stride 320 at 12 s
T_TR = 299       # post time-reduction (factor 2)
T_UP = 598       # upsampled (ConvTranspose k=s=2)

TEACHER_SPEC = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2
STUDENT_SPEC = ((128, 10, 5), (256, 1, 1)) + ((256, 3, 2),) * 4 + \
    ((512, 1, 1),) + ((512, 2, 2),) * 2

PEAK = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5": 459e12,
        "TPU v6 lite": 918e12}
HBM_GBPS = {"TPU v5 lite": 819, "TPU v4": 1228, "TPU v5": 2765,
            "TPU v6 lite": 1640}


# Timing over the axon tunnel: ONE device->host fetch costs ~60 ms and
# run-to-run noise is several ms, so absolute single-call timings of sub-ms
# ops are meaningless. Both timers below use a TWO-POINT DIFFERENCE:
# per_unit = (T(n2) - T(n1)) / (n2 - n1), which cancels the fixed
# fetch/dispatch cost exactly; n2 is escalated until the delta is well above
# the noise floor. min (not median) over repeats — tunnel noise is positive.

_MIN_DELTA_S = 0.08


def _timeit(fn, *args, n1=2, n2=12):
    """Per-call time of a jitted fn via the call-count difference method
    (for ops in the >= 1 ms range: conv stacks, VJPs)."""
    from fithubert_tpu.utils.barrier import fetch_barrier

    fetch_barrier(fn(*args))
    fetch_barrier(fn(*args))

    def total(n):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            fetch_barrier(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = total(n1), total(n2)
    while t2 - t1 < _MIN_DELTA_S and n2 < 400:
        n2 *= 4
        t2 = total(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _timeit_chain(body, carry0, consts):
    """Per-iteration time of `carry = body(carry, consts)` chained on device
    inside lax.fori_loop (the carry feeds the next iteration, so XLA cannot
    hoist the op), loop-length difference method."""
    import jax

    from fithubert_tpu.utils.barrier import fetch_barrier

    def make(n):
        @jax.jit
        def run(c, k):
            return jax.lax.fori_loop(0, n, lambda i, cc: body(cc, k), c)

        return run

    def t(run):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch_barrier(run(carry0, consts))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n1, n2 = 64, 1088
    r1 = make(n1)
    fetch_barrier(r1(carry0, consts))
    t1 = t(r1)
    while True:
        r2 = make(n2)
        fetch_barrier(r2(carry0, consts))
        t2 = t(r2)
        if t2 - t1 >= _MIN_DELTA_S or n2 >= 70_000:
            break
        n2 *= 8
    return max((t2 - t1) / (n2 - n1), 1e-12)


def bench_dense_square(rows, k, dtype):
    """y <- y @ w, w (k, k): one square matmul per chain step."""
    import jax.numpy as jnp

    y = jnp.zeros((rows, k), dtype)
    w = jnp.zeros((k, k), dtype)
    dt = _timeit_chain(lambda c, w_: c @ w_, y, w)
    return 2 * rows * k * k, dt


def bench_dense_pair(rows, k, n, dtype):
    """y <- (y @ w1) @ w2: an (k->n) + (n->k) matmul pair per chain step
    (the fc1/fc2 shape, or any rectangular proj + its transpose-shape)."""
    import jax.numpy as jnp

    y = jnp.zeros((rows, k), dtype)
    w1 = jnp.zeros((k, n), dtype)
    w2 = jnp.zeros((n, k), dtype)
    dt = _timeit_chain(lambda c, ws: (c @ ws[0]) @ ws[1], y, (w1, w2))
    return 2 * 2 * rows * k * n, dt  # both matmuls counted


def bench_attn_bmm_pair(g, m, k, dtype):
    """q <- (q @ k^T) @ v: exactly the QK^T + PV pair at head dim k."""
    import jax.numpy as jnp

    q = jnp.zeros((g, m, k), dtype)
    kv = jnp.zeros((g, m, k), dtype)

    def body(c, kv_):
        s = jnp.einsum("gmk,gnk->gmn", c, kv_)
        return jnp.einsum("gmn,gnk->gmk", s, kv_)

    dt = _timeit_chain(body, q, kv)
    return 2 * 2 * g * m * m * k, dt


def bench_pos_conv(b, t, c, groups, k, dtype):
    """y <- grouped_conv(y): SAME padding keeps the carry shape."""
    import jax
    import jax.numpy as jnp

    y = jnp.zeros((b, t, c), dtype)
    w = jnp.zeros((k, c // groups, c), dtype)

    def body(c_, w_):
        out = jax.lax.conv_general_dilated(
            c_, w_, (1,), [(k // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )
        return out[:, :t, :]  # even k pads one extra frame; crop to carry shape

    dt = _timeit_chain(body, y, w)
    return 2 * b * t * k * c * (c // groups), dt


def bench_conv_stack(spec, t_wav, b, dtype, with_vjp=False):
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.ops.pallas.conv_frontend import conv_stack

    # the model runs block 0 (c_in=1) as XLA conv and the 128-lane-aligned
    # tail through the pallas kernel; time the whole stack via the dispatcher
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t_wav, 1)) * 0.1, dtype)
    ws, c_in = [], 1
    for (d, k, _s) in spec:
        ws.append(jnp.asarray(rng.standard_normal((k, c_in, d)) * 0.05, dtype))
        c_in = d
    head, tail = ws[0], tuple(ws[1:])

    def fwd(x_, head_, tail_):
        y = jax.lax.conv_general_dilated(
            x_, head_, (spec[0][2],), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return conv_stack(y, tail_, spec[1:])

    fl = 0
    t, c = t_wav, 1
    for (d, k, s) in spec:
        t = (t - k) // s + 1
        fl += 2 * b * t * k * c * d
        c = d
    if not with_vjp:
        return fl, _timeit(jax.jit(fwd), x, head, tail)

    def loss(x_, head_, tail_):
        return jnp.sum(fwd(x_, head_, tail_).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    return 2 * fl, _timeit(g, x, head, tail)  # bwd ~= 2x fwd flops


def bench_adamw(n_params):
    """One AdamW update on a flat fp32 param vector (the bandwidth-bound
    ceiling of what the step's optimizer segment could ever reach)."""
    import jax.numpy as jnp
    import optax

    tx = optax.adamw(1e-4)
    p = {"w": jnp.zeros((n_params,), jnp.float32)}
    g = {"w": jnp.zeros((n_params,), jnp.float32)}
    st = tx.init(p)

    def body(carry, g_):
        p_, st_ = carry
        u, st_ = tx.update(g_, st_, p_)
        return optax.apply_updates(p_, u), st_

    return _timeit_chain(body, (p, st), g)


def main():
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(probe_backend=True)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK.items() if kind.startswith(k)), 197e12)
    hbm = next((v for k, v in HBM_GBPS.items() if kind.startswith(k)), 819)
    bf16 = jnp.bfloat16

    comps = []

    def add_rated(name, flops, fl_dt, note=""):
        """Component whose light-speed time = analytic flops / measured
        standalone rate at the SAME shape (rate from an on-device chain)."""
        fl, dt = fl_dt
        rate = fl / dt
        comps.append({
            "component": name,
            "flops_g": round(flops / 1e9, 1),
            "solo_ms": round(flops / rate * 1e3, 3),
            "tflops_per_s": round(rate / 1e12, 1),
            "pct_peak": round(100 * rate / peak, 1),
            "note": note,
        })
        print(json.dumps(comps[-1]), flush=True)

    def add_timed(name, fl_dt, note=""):
        """Component timed directly (big ops: dispatch overhead irrelevant)."""
        fl, dt = fl_dt
        comps.append({
            "component": name,
            "flops_g": round(fl / 1e9, 1),
            "solo_ms": round(dt * 1e3, 3),
            "tflops_per_s": round(fl / dt / 1e12, 1),
            "pct_peak": round(100 * (fl / dt) / peak, 1),
            "note": note,
        })
        print(json.dumps(comps[-1]), flush=True)

    rt, rs = B * T_FRAMES, B * T_TR
    # ---- teacher forward (frozen, fwd only)
    add_rated("teacher.qkvo_proj 768x768", 12 * 4 * 2 * rt * 768 * 768,
              bench_dense_square(rt, 768, bf16))
    add_rated("teacher.ffn 768<->3072", 12 * 2 * 2 * rt * 768 * 3072,
              bench_dense_pair(rt, 768, 3072, bf16))
    add_rated("teacher.attn qk^t+pv d=64",
              12 * 2 * 2 * 144 * T_FRAMES * T_FRAMES * 64,
              bench_attn_bmm_pair(144, T_FRAMES, 64, bf16),
              "lane eff <= 64/128")
    add_rated("teacher.pos_conv k=128 g=16",
              2 * B * T_FRAMES * 128 * 768 * 48,
              bench_pos_conv(B, T_FRAMES, 768, 16, 128, bf16))
    add_timed("teacher.conv_stack",
              bench_conv_stack(TEACHER_SPEC, T_WAV, B, bf16),
              "pallas kernel fwd, measured directly")

    # ---- student forward+backward: matmul classes x3 (bwd ~= 2x fwd, same
    # shapes transposed; rates of the transposes are within noise)
    add_rated("student.qkvo_proj 480x480 (x3 f/b)",
              3 * 12 * 4 * 2 * rs * 480 * 480,
              bench_dense_square(rs, 480, bf16))
    add_rated("student.ffn 480->480 (x3 f/b)",
              3 * 12 * 2 * 2 * rs * 480 * 480,
              bench_dense_square(rs, 480, bf16))
    add_rated("student.attn qk^t+pv d=40 (x3 f/b)",
              3 * 12 * 2 * 2 * 144 * T_TR * T_TR * 40,
              bench_attn_bmm_pair(144, T_TR, 40, bf16),
              "lane eff <= 40/128")
    add_rated("student.pos_conv k=128 g=16 (x3 f/b)",
              3 * 2 * B * T_FRAMES * 128 * 480 * 30,
              bench_pos_conv(B, T_FRAMES, 480, 16, 128, bf16))
    add_rated("student.tr+upsample 480<->960 (x3)",
              3 * (2 * rs * 960 * 480 + 12 * 2 * rs * 480 * 960),
              bench_dense_pair(rs, 480, 960, bf16))
    add_rated("student.head_proj 480->768 (x3)",
              3 * 12 * 2 * B * T_UP * 480 * 768,
              bench_dense_pair(B * T_UP, 480, 768, bf16))
    add_timed("student.conv_stack fwd",
              bench_conv_stack(STUDENT_SPEC, T_WAV, B, bf16),
              "pallas kernel, measured directly")
    add_timed("student.conv_stack vjp",
              bench_conv_stack(STUDENT_SPEC, T_WAV, B, bf16, with_vjp=True),
              "fwd+bwd via jax.grad, measured directly")

    # ---- optimizer (measured standalone) + loss bandwidth floor
    n_params = 22_500_000
    opt_ms = bench_adamw(n_params) * 1e3
    comps.append({"component": "optimizer.adamw 22.5M fp32", "count": 1,
                  "flops_g": 0.0, "solo_ms": round(opt_ms, 3),
                  "tflops_per_s": 0.0, "pct_peak": 0.0,
                  "note": f"bandwidth floor {n_params * 4 * 6 / hbm / 1e6:.2f} ms"})
    print(json.dumps(comps[-1]), flush=True)
    # rec-loss tensors: 12 proj outputs + 12 teacher hiddens, (B, 598, 768)
    # bf16, ~3 passes (diff, square/abs, reduce)
    loss_bytes = 24 * B * T_UP * 768 * 2 * 3
    loss_ms = loss_bytes / (hbm * 1e9) * 1e3
    comps.append({"component": "loss.rec 12-layer bandwidth floor", "count": 1,
                  "flops_g": 0.0, "solo_ms": round(loss_ms, 3),
                  "tflops_per_s": 0.0, "pct_peak": 0.0, "note": "analytic"})
    print(json.dumps(comps[-1]), flush=True)

    step_ms = 93.0  # measured fused KD step (bench.py; override --step-ms)
    if "--step-ms" in sys.argv:
        step_ms = float(sys.argv[sys.argv.index("--step-ms") + 1])
    light_ms = sum(c["solo_ms"] for c in comps)
    total_flops = sum(c["flops_g"] for c in comps) * 1e9
    summary = {
        "metric": "mfu_roofline",
        "device_kind": kind,
        "light_speed_ms": round(light_ms, 2),
        "analytic_tflops_per_step": round(total_flops / 1e12, 3),
        "mfu_bound": round(total_flops / (light_ms / 1e3) / peak, 4),
        "measured_step_ms": step_ms,
        "measured_mfu": round(total_flops / (step_ms / 1e3) / peak, 4),
        "fraction_of_light_speed": round(light_ms / step_ms, 3),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
