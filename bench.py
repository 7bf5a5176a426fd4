#!/usr/bin/env python
"""Benchmarks on the FitHuBERT-960h release geometry (configs/fithubert.yaml).

Prints TWO JSON lines (the driver parses the LAST line as the headline):

  1. {"metric": "student_fwd_audio_sec_per_sec_per_chip", ...} — student
     forward throughput; north-star target >= 2000x real-time (BASELINE.md).
  2. {"metric": "kd_train_step_steps_per_sec", ...}  — THE HEADLINE: the
     fused KD train step (teacher fwd + student fwd/bwd + loss + AdamW in one
     jitted graph) at the training config of record: batch 3 x grad-accum 4,
     12 s utterances, bf16 (reference data/conf/fithubert.yaml:7-11,91-97).
     Carries audio-sec/sec/chip, an analytic-FLOPs MFU estimate, and the fwd
     numbers again under "extra" so a single-line consumer sees everything.

Timing integrity (the BENCH_r02 headline was off by 186x because the fetch
barrier silently degraded to block_until_ready — see VERDICT round 2):

  - The device->host fetch path is probed with a watchdog BEFORE EVERY
    metric; each line reports "fetch_ok". A failed probe marks the line
    "untrusted": true — block_until_ready alone measures dispatch, not
    execution, over the axon tunnel and is never silently substituted.
  - Every throughput is cross-checked against the analytic-FLOPs physical
    bound of the chip (a number implying more FLOP/s than the hardware peak
    is marked untrusted), and the student forward is additionally bounded by
    the rate implied by the (FLOPs-richer) train step.

vs_baseline: fwd line = value / 2000 (the north-star multiple); train-step
line = audio-sec/sec/chip / 250, where 250 = LibriSpeech-960h x 100 epochs
(345.6M audio-sec) / (24 h x 16 chips of a v4-32) — the BASELINE.json
"paper-parity loss in <24h on a v4-32" north star expressed per chip.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import threading
import time

import numpy as np

SR = 16_000
FWD_TARGET = 2000.0  # x real-time, BASELINE.md north star
TRAIN_TARGET_AUDIO_PER_SEC = 345_600_000 / (24 * 3600 * 16)  # = 250
# The standalone forward may beat the train step's hardware efficiency
# somewhat (bigger batch, no tiny optimizer/loss ops) but not by much; 3x is
# a generous margin for the train-implied cross-check.
FWD_VS_TRAIN_MFU_MARGIN = 3.0

# bf16 peak FLOP/s per chip by device kind (for the MFU estimate)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,  # v6e
}


def _make_sync():
    """(sync, fetch_ok): an honest per-call barrier + the fetch-path health.

    Probes the device->host fetch path fresh (the tunnel can wedge mid-run);
    when healthy, sync = block_until_ready + a WATCHDOGGED one-scalar fetch
    (the tunnel can wedge BETWEEN the probe and a timing loop's final sync —
    a raw fetch there would hang bench forever). Any sync that degrades
    flips sync.degraded, and callers MUST mark such numbers untrusted —
    silent degradation to block_until_ready is the exact failure that
    produced the impossible BENCH_r02 headline."""
    import jax

    from fithubert_tpu.utils.barrier import probe_fetch, timed_fetch_barrier

    fetch_ok = probe_fetch(timeout=60.0)
    if not fetch_ok:  # tunnel wedges are often transient; one retry
        time.sleep(10.0)
        fetch_ok = probe_fetch(timeout=60.0)

    def sync(x):
        if fetch_ok and not sync.degraded:
            if not timed_fetch_barrier(x, timeout=120.0):
                sync.degraded = True
        else:
            jax.block_until_ready(x)

    sync.degraded = False
    return sync, fetch_ok


def _zeros_like_shapes(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


# ------------------------------------------------------------ analytic FLOPs
def _conv_stack_flops(spec, t_in: int, b: int, c_in: int = 1):
    fl, t, c = 0, t_in, c_in
    for (d, k, s) in spec:
        t = (t - k) // s + 1
        fl += 2 * b * t * k * c * d
        c = d
    return fl, t


def _encoder_flops(b, t, c, ffn, layers, heads, pos_k, pos_g, t_pos=None):
    """Matmul FLOPs of one forward pass of a (pos_conv + N transformer
    layers) stack: qkv/out projections, T x T attention, FFN. The pos conv
    runs at the ENCODER INPUT length t_pos (pre-TR — the TR layer reduces T
    inside the slot loop, after pos_conv)."""
    pos = 2 * b * (t_pos if t_pos is not None else t) * pos_k * c * (c // pos_g)
    per_layer = (
        4 * (2 * b * t * c * c)  # q, k, v, out projections
        + 2 * (2 * b * t * t * c)  # QK^T and PV
        + 2 * (2 * b * t * c * ffn)  # fc1, fc2
    )
    return pos + layers * per_layer


def _student_fwd_flops(d, b, t_wav, live_heads=None):
    """Analytic matmul FLOPs of ONE student forward pass (extractor +
    encoder + TR/upsample + projection heads) at batch b, t_wav samples.

    live_heads: how many layer-wise projection heads the consumer actually
    computes — the x-only forward (feature extraction, bench_student_fwd)
    DCEs all but the last head; the train step needs all of them (None =
    all encoder_layers)."""
    s_fl, s_frames = _conv_stack_flops(d.conv_feature_layers, t_wav, b)
    t_enc = s_frames // d.tr_reduce_factor if d.enable_tr_layer else s_frames
    s_fl += _encoder_flops(
        b, t_enc, d.encoder_embed_dim, d.encoder_ffn_embed_dim,
        d.encoder_layers, d.encoder_attention_heads, d.conv_pos,
        d.conv_pos_groups, t_pos=s_frames,
    )
    if d.enable_tr_layer:  # TR conv + upsampler ConvTranspose, k = s = factor
        f = d.tr_reduce_factor
        s_fl += 2 * 2 * b * t_enc * f * d.encoder_embed_dim * d.encoder_embed_dim
    if d.layerwise_proj:  # per-layer upsample + Linear d_model -> final_dim
        n_heads = d.encoder_layers if live_heads is None else live_heads
        s_fl += n_heads * (
            2 * b * t_enc * d.tr_reduce_factor
            * d.encoder_embed_dim * d.encoder_embed_dim
            + 2 * b * s_frames * d.encoder_embed_dim * d.pred_head_final_dim
        )
    return s_fl


def _kd_step_flops(cfg, teacher_geom, b, t_wav, accum):
    """Analytic matmul FLOPs of one optimizer step (forward-only teacher +
    forward+backward student + projection heads), per the fithubert.yaml
    geometry. Backward ~= 2x forward for matmul-dominated graphs."""
    # teacher: fwd only (frozen)
    t_fl, t_frames = _conv_stack_flops(teacher_geom.conv_feature_layers, t_wav, b)
    t_fl += _encoder_flops(
        b, t_frames, teacher_geom.encoder_embed_dim,
        teacher_geom.encoder_ffn_embed_dim, teacher_geom.encoder_layers,
        teacher_geom.encoder_attention_heads, teacher_geom.conv_pos,
        teacher_geom.conv_pos_groups,
    )
    # student: fwd + bwd (3x fwd)
    s_fl = _student_fwd_flops(cfg.distiller, b, t_wav)
    return accum * (t_fl + 3 * s_fl)


# --------------------------------------------------------------- benchmarks
def bench_student_fwd(platform, quick, sync, int8=False):
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import StudentModel

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml")).distiller
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", quantize_matmuls=int8
    )
    model = StudentModel(cfg=cfg)

    if quick:
        b, wav_sec, iters = 1, 2.0, 2
    elif platform == "tpu":
        b, wav_sec, iters = 32, 16.0, 30
    else:  # CPU smoke sizing
        b, wav_sec, iters = 2, 4.0, 3
    t_wav = int(wav_sec * SR)

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
    params = _zeros_like_shapes(shapes)

    @jax.jit
    def fwd(params, wav, mask):
        return model.apply({"params": params}, wav, mask, deterministic=True).x

    sync(fwd(params, wav, mask))
    sync(fwd(params, wav, mask))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, wav, mask)
    sync(out)
    dt = time.perf_counter() - t0
    return {
        "value": (b * wav_sec * iters) / dt,
        # per audio-second FLOPs of this forward, for the physical-bound
        # check (x-only: all but the last projection head are DCE'd)
        "flops_per_audio_sec": _student_fwd_flops(cfg, b, t_wav, live_heads=1)
        / (b * wav_sec),
    }


def bench_train_step(platform, quick, sync):
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_yaml_config(os.path.join(here, "configs", "fithubert.yaml"))

    if quick or platform != "tpu":
        # smoke sizing: the full 12+12-layer graph takes minutes to compile
        # on this 1-core CPU; shrink depth but keep the step structure
        cfg = dataclasses.replace(
            cfg,
            distiller=dataclasses.replace(
                cfg.distiller, encoder_layers=2,
            ),
            loss=dataclasses.replace(cfg.loss, distil_random_layer=1),
        )
        teacher_geom = dataclasses.replace(
            TeacherGeometry.from_teacher_config(cfg.teacher),
            encoder_layers=2, compute_dtype="bfloat16",
        )
        b, accum, wav_sec, iters = 1, 2, 2.0, 2
    else:
        teacher_geom = dataclasses.replace(
            TeacherGeometry.from_teacher_config(cfg.teacher),
            compute_dtype="bfloat16",
        )
        # training config of record: batch 3 x accum 4, ~12 s utterances
        b, accum, wav_sec, iters = cfg.train.batch_size, \
            cfg.train.accumulate_grad_batches, 12.0, 10

    t_wav = int(wav_sec * SR)
    distiller = Distiller(cfg, num_training_steps=1000,
                          teacher_geometry=teacher_geom)

    rng = jax.random.PRNGKey(0)
    sample_wav = jnp.zeros((b, t_wav), jnp.float32)
    teacher_params = distiller.prepare_teacher_params(_zeros_like_shapes(
        jax.eval_shape(distiller.init_teacher_params, rng, sample_wav)
    ))
    state = _zeros_like_shapes(
        jax.eval_shape(distiller.init_state, rng, sample_wav)
    )

    np_rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(
            np_rng.standard_normal((accum, b, t_wav)) * 0.1, jnp.float32
        ),
        "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool),
    }
    n_rand = max(1, cfg.loss.distil_random_layer)
    rand_layers = jnp.arange(n_rand, dtype=jnp.int32)

    from fithubert_tpu.utils.rng import root_step_key

    rng = root_step_key(0)  # rbg mask streams on TPU, as training uses
    step = distiller.make_train_step()
    # warmup/compile (donated state: re-feed the returned one)
    state, logs = step(state, teacher_params, batch, rand_layers, rng)
    sync(logs["loss"])
    state, logs = step(state, teacher_params, batch, rand_layers, rng)
    sync(logs["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, teacher_params, batch, rand_layers, rng)
    sync(logs["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = iters / dt
    # NOTE: a train.steps_per_launch=4 chain variant was benched here and
    # measured 0.989x the single-launch rate — launches already pipeline
    # over the tunnel, and the scan's train-state loop carry costs a little.
    # The headline therefore stays the single-launch step (the chain remains
    # a loop feature for environments with real per-launch overhead).

    audio_per_sec = steps_per_sec * accum * b * wav_sec
    flops_per_step = _kd_step_flops(cfg, teacher_geom, b, t_wav, accum)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_FLOPS.items() if kind.startswith(k)), None)
    mfu = (flops_per_step * steps_per_sec / peak) if peak else None
    return {
        "metric": "kd_train_step_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec (fithubert.yaml geometry)" if not (quick or platform != "tpu")
        else "steps/sec (smoke-sized geometry)",
        "vs_baseline": round(audio_per_sec / TRAIN_TARGET_AUDIO_PER_SEC, 4),
        "audio_sec_per_sec_per_chip": round(audio_per_sec, 2),
        "analytic_tflops_per_step": round(flops_per_step / 1e12, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "device_kind": kind,
    }


def _peak_flops(device_kind: str):
    return next(
        (v for k, v in PEAK_FLOPS.items() if device_kind.startswith(k)), None
    )


def apply_integrity_checks(fwd_line, fwd, train_line, peak, kind, full_geom):
    """Mark physically impossible or cross-inconsistent results untrusted.

    Mutates the two JSON lines in place (unit-tested in tests/test_bench.py):
      - fwd implied FLOP/s > hardware peak -> fwd untrusted
      - train MFU > 1 -> train untrusted
      - fwd rate > train-step-implied bound x margin -> fwd untrusted
        (only when the train line is trusted and both ran the full geometry)
    """
    implied = fwd["flops_per_audio_sec"] * fwd["value"]
    if peak is not None and implied > peak:
        fwd_line["untrusted"] = True
        fwd_line["untrusted_reason"] = (
            f"implied {implied / 1e12:.0f} TFLOP/s exceeds the "
            f"{peak / 1e12:.0f} TFLOP/s peak of {kind}"
        )
    if peak is not None and train_line.get("mfu") and train_line["mfu"] > 1.0:
        train_line["untrusted"] = True
        train_line["untrusted_reason"] = (
            f"MFU {train_line['mfu']:.2f} > 1: implied FLOP/s exceeds the "
            f"hardware peak of {kind}"
        )
    if full_geom and not train_line["untrusted"] and not fwd_line["untrusted"]:
        train_audio_rate = train_line["audio_sec_per_sec_per_chip"]
        audio_per_step = train_audio_rate / train_line["value"]
        train_flops_per_audio = (
            train_line["analytic_tflops_per_step"] * 1e12 / audio_per_step
        )
        bound = (
            train_audio_rate
            * (train_flops_per_audio / fwd["flops_per_audio_sec"])
            * FWD_VS_TRAIN_MFU_MARGIN
        )
        if fwd["value"] > bound:
            fwd_line["untrusted"] = True
            fwd_line["untrusted_reason"] = (
                f"{fwd['value']:.0f} audio-s/s exceeds the train-step-implied "
                f"bound of {bound:.0f} (r02 failure mode: a broken barrier)"
            )


def _error_line(msg: str, metric: str = "kd_train_step_steps_per_sec") -> dict:
    """The headline metric's shape with value=null and a machine-readable
    error — what the driver records when the backend cannot be reached
    (instead of the raw-traceback/`parsed: null` of BENCH_r03)."""
    line = {
        "metric": metric,
        "value": None,
        "vs_baseline": None,
        "untrusted": True,
        "error": msg,
    }
    if metric == "kd_train_step_steps_per_sec":
        line["unit"] = "steps/sec (fithubert.yaml geometry)"
    return line


_ATTEMPT_ENV = "FITHUBERT_BENCH_ATTEMPT"


def _reexec_or_die(msg: str, attempts: int, retry_delay: float,
                   metric: str = "kd_train_step_steps_per_sec") -> None:
    """Retry backend init by re-exec (jax caches a FAILED backend init for
    the life of the process, so an in-process retry can never succeed), or
    print the structured error line and exit 0 on the last attempt.

    Re-execs sys.argv[0] — NOT this file — so callers that import bench for
    _acquire_backend (scripts/int8_ab.py) relaunch themselves instead of a
    full bench run under their own argv, and their soft-fail line carries
    their own metric name."""
    attempt = int(os.environ.get(_ATTEMPT_ENV, "1"))
    if attempt < attempts:
        print(
            f"# backend init failed (attempt {attempt}/{attempts}), "
            f"retrying in {retry_delay:.0f}s: {msg}",
            file=sys.stderr, flush=True,
        )
        time.sleep(retry_delay)
        os.environ[_ATTEMPT_ENV] = str(attempt + 1)
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(sys.argv[0])] + sys.argv[1:])
    print(json.dumps(_error_line(
        f"backend init failed after {attempts} attempts: {msg}", metric)),
        flush=True)
    os._exit(0)


def _acquire_backend(attempts: int | None = None,
                     retry_delay: float | None = None,
                     init_timeout: float | None = None,
                     metric: str = "kd_train_step_steps_per_sec"):
    """Initialize the JAX backend; never raise, never hang.

    Tunnel/endpoint failures are often transient (CLAUDE.md), so a failed
    init re-execs this process up to `attempts` times. A HUNG init (the
    other observed failure mode — jax.devices() can block indefinitely when
    the tunnel is half-up) is caught by a watchdog thread that re-execs (or
    soft-fails) from outside the stuck call: execv replaces the whole
    process image, stuck main thread included. On final failure a single
    structured JSON line is printed and the process exits 0 so the driver
    records WHY (VERDICT r3 #1a)."""
    if attempts is None:
        attempts = int(os.environ.get("FITHUBERT_BENCH_ATTEMPTS", "3"))
    if retry_delay is None:
        retry_delay = float(os.environ.get("FITHUBERT_BENCH_RETRY_DELAY", "45"))
    if init_timeout is None:
        init_timeout = float(
            os.environ.get("FITHUBERT_BENCH_INIT_TIMEOUT", "480"))

    init_done = threading.Event()

    def watchdog():
        if not init_done.wait(timeout=init_timeout):
            _reexec_or_die(f"backend init hung > {init_timeout:.0f}s",
                           attempts, retry_delay, metric)

    th = threading.Thread(target=watchdog, daemon=True)
    th.start()
    try:
        import jax

        from fithubert_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache(probe_backend=True)
        d = jax.devices()[0]
        platform, kind = d.platform, d.device_kind
    except Exception as e:  # noqa: BLE001 — anything here means "no backend"
        init_done.set()  # the watchdog must not race the explicit handler
        _reexec_or_die(f"{type(e).__name__}: {e}", attempts, retry_delay,
                       metric)
        raise AssertionError("unreachable")  # pragma: no cover
    finally:
        init_done.set()
    # the long benchmark phase that follows is NOT under the init timeout
    return platform, kind


def main():
    platform, kind = _acquire_backend()
    peak = _peak_flops(kind)
    quick = "--quick" in sys.argv

    def fwd_line_from(fwd, fetch_ok):
        line = {
            "metric": "student_fwd_audio_sec_per_sec_per_chip",
            "value": round(fwd["value"], 2),
            "unit": "audio-sec/sec/chip",
            "vs_baseline": round(fwd["value"] / FWD_TARGET, 4),
            "fetch_ok": fetch_ok,
            "untrusted": not fetch_ok,
        }
        if not fetch_ok:
            line["untrusted_reason"] = (
                "device->host fetch probe failed: timed with "
                "block_until_ready only, which measures dispatch, not "
                "execution, over the tunnel"
            )
        return line

    def measure_fwd(sync, probe_ok):
        """Bf16 forward (+ the optional --int8 datum) under one sync; used
        for both the first pass and a post-recovery re-measure so the int8
        datum is never silently dropped (ADVICE r3)."""
        fwd = bench_student_fwd(platform, quick, sync)
        line = fwd_line_from(fwd, probe_ok and not sync.degraded)
        if sync.degraded:
            line["untrusted_reason"] = (
                "fetch barrier wedged mid-run; later syncs degraded to "
                "block_until_ready"
            )
        if "--int8" in sys.argv and probe_ok and not sync.degraded:
            # optional: the int8-serving fwd (StudentConfig.quantize_matmuls)
            # — an extra datum on the fwd line, never the headline (quantized
            # numerics are opt-in, the parity configuration stays bf16)
            q = bench_student_fwd(platform, quick, sync, int8=True)
            line["int8_value"] = round(q["value"], 2)
            line["int8_untrusted"] = bool(sync.degraded)
        return fwd, line

    # Warm the device->host fetch path once with a generous budget: the
    # FIRST fetch after backend init has been observed to take minutes over
    # a cold tunnel (compile + handshake), which would otherwise fail the
    # 60 s health probes below and mark every line untrusted for a purely
    # transient reason.
    if platform != "cpu":
        from fithubert_tpu.utils.barrier import probe_fetch

        probe_fetch(timeout=float(
            os.environ.get("FITHUBERT_BENCH_WARM_TIMEOUT", "600")))

    # --- student forward (printed first; the train line is the headline) ---
    sync, fetch_ok = _make_sync()
    fwd, fwd_line = measure_fwd(sync, fetch_ok)

    # --- KD train step: the headline (last line; driver parses the last) ---
    sync, fetch_ok = _make_sync()  # re-probe: the fetch path can die mid-run
    train_line = bench_train_step(platform, quick, sync)
    fetch_ok = fetch_ok and not sync.degraded
    train_line["fetch_ok"] = fetch_ok
    train_line["untrusted"] = not fetch_ok
    if not fetch_ok:
        train_line["untrusted_reason"] = (
            "fetch barrier wedged mid-run; timing degraded to "
            "block_until_ready" if sync.degraded else fwd_line.get(
                "untrusted_reason", "device->host fetch probe failed",
            )
        )

    if not fwd_line["fetch_ok"] and fetch_ok:
        # the tunnel's fetch path recovered mid-run (wedges are transient —
        # CLAUDE.md): re-measure the forward (including any --int8 datum)
        # with the healthy barrier rather than shipping an untrusted line
        # (compiles are cached, so this is cheap)
        fwd, fwd_line = measure_fwd(sync, True)

    # cross-checks: physical peak bound + train-step-implied bound (at equal
    # hardware efficiency, fwd rate = train rate x FLOPs ratio per
    # audio-second; margin for batch effects). The latter only when the train
    # line is trusted and both runs used the full (non-smoke) geometry.
    apply_integrity_checks(
        fwd_line, fwd, train_line, peak, kind,
        full_geom=(platform == "tpu" and not quick),
    )

    print(json.dumps(fwd_line), flush=True)
    train_line["extra"] = {
        k: v for k, v in fwd_line.items() if k not in ("unit", "extra")
    }
    print(json.dumps(train_line), flush=True)


if __name__ == "__main__":
    main()
