"""bench.py integrity checks (VERDICT r2 #1): the r02 headline published a
student-forward number 186x too fast because a silently degraded barrier
measured dispatch instead of execution. These unit tests pin the guards that
make that class of artifact impossible to publish unflagged."""

import bench


def _fwd_line(value):
    return {
        "metric": "student_fwd_audio_sec_per_sec_per_chip",
        "value": value,
        "fetch_ok": True,
        "untrusted": False,
    }


def _train_line(steps_per_sec=10.35, audio=1490.5, tflops=3.689, mfu=0.194):
    return {
        "metric": "kd_train_step_steps_per_sec",
        "value": steps_per_sec,
        "audio_sec_per_sec_per_chip": audio,
        "analytic_tflops_per_step": tflops,
        "mfu": mfu,
        "fetch_ok": True,
        "untrusted": False,
    }


PEAK = 197e12  # v5e
# fithubert.yaml student fwd at b=32, 16 s (bench._student_fwd_flops):
# ~3.61 GF per audio-second -> 15k audio-s/s implies ~54 TF/s (plausible)
FLOPS_PER_AUDIO = 3.611e9


def test_honest_numbers_stay_trusted():
    """The r01-consistent numbers (15k fwd, 10.35 steps/s) pass untouched."""
    fwd_line = _fwd_line(15_000.0)
    fwd = {"value": 15_000.0, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line()
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=True)
    assert not fwd_line["untrusted"]
    assert not train["untrusted"]


def test_r02_magnitude_is_flagged_physically_impossible():
    """The actual r02 value (2.8M audio-s/s) implies ~60 PFLOP/s — must be
    marked untrusted by the peak-FLOPs bound alone."""
    value = 2_797_113.0
    fwd_line = _fwd_line(value)
    fwd = {"value": value, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line()
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=True)
    assert fwd_line["untrusted"]
    assert "peak" in fwd_line["untrusted_reason"]


def test_subphysical_but_inconsistent_is_flagged_by_cross_check():
    """A value below the physical peak but far above what the train step
    implies (e.g. a partially-degraded barrier) trips the cross-check.
    Train-implied bound here: 1490.5 audio-s/s x (25.6/3.61 FLOPs ratio) x
    3 margin ~= 31.7k audio-s/s."""
    value = 40_000.0  # implies ~144 TF/s: under the 197 TF/s peak, 2.7x r01
    fwd_line = _fwd_line(value)
    fwd = {"value": value, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line()
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=True)
    assert fwd_line["untrusted"]
    assert "train-step-implied" in fwd_line["untrusted_reason"]


def test_impossible_train_mfu_is_flagged():
    fwd_line = _fwd_line(15_000.0)
    fwd = {"value": 15_000.0, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line(steps_per_sec=2000.0, mfu=37.5)
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=True)
    assert train["untrusted"]
    assert "MFU" in train["untrusted_reason"]


def test_untrusted_train_line_disables_cross_check():
    """A garbage train line must not be used as a bound for the fwd line."""
    value = 40_000.0
    fwd_line = _fwd_line(value)
    fwd = {"value": value, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line()
    train["untrusted"] = True  # e.g. its fetch probe failed
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=True)
    assert not fwd_line["untrusted"]  # flagged only by fetch_ok, not here


def test_smoke_geometry_skips_cross_check():
    """CPU/--quick runs use shrunken geometry; the FLOPs ratio is wrong
    there, so the cross-check must not fire."""
    value = 40_000.0
    fwd_line = _fwd_line(value)
    fwd = {"value": value, "flops_per_audio_sec": FLOPS_PER_AUDIO}
    train = _train_line()
    bench.apply_integrity_checks(fwd_line, fwd, train, PEAK, "TPU v5 lite",
                                 full_geom=False)
    assert not fwd_line["untrusted"]


# --------------------------------------------------------------- soft-fail
# BENCH_r03 was rc=1/parsed:null because a backend-init failure produced a
# raw traceback. These tests pin the fix (VERDICT r3 #1a): on final failure
# bench prints ONE structured JSON line and exits 0; with attempts left it
# re-execs (in-process retry cannot work — jax caches the failed backend).

import json
import os
import sys

import pytest


def test_error_line_is_the_headline_metric_shape():
    line = bench._error_line("boom")
    assert line["metric"] == "kd_train_step_steps_per_sec"
    assert line["value"] is None
    assert line["untrusted"] is True
    assert "boom" in line["error"]
    json.dumps(line)  # must be serializable as-is


def test_reexec_or_die_final_attempt_prints_json_and_exits_0(
        monkeypatch, capsys):
    monkeypatch.setenv(bench._ATTEMPT_ENV, "3")
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench._reexec_or_die("TPU backend setup/compile error", attempts=3,
                         retry_delay=0.0)
    assert exits == [0]
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] is None and line["untrusted"] is True
    assert "TPU backend setup/compile error" in line["error"]
    assert "3 attempts" in line["error"]


class _ExecvCalled(Exception):
    pass


def test_reexec_or_die_with_attempts_left_reexecs(monkeypatch):
    monkeypatch.setenv(bench._ATTEMPT_ENV, "1")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake_execv(exe, argv):
        # the real execv never returns; raising stops the fall-through to
        # the final-print + os._exit path
        calls.append((exe, argv))
        raise _ExecvCalled

    monkeypatch.setattr(os, "execv", fake_execv)
    with pytest.raises(_ExecvCalled):
        bench._reexec_or_die("transient", attempts=3, retry_delay=45.0)
    assert len(calls) == 1
    exe, argv = calls[0]
    # re-execs the INVOKING script (sys.argv[0]), not bench.py: importers of
    # bench (scripts/int8_ab.py) must relaunch themselves, not a bench run
    # under their own argv (ADVICE r4)
    assert argv[1] == os.path.abspath(sys.argv[0])
    assert os.environ[bench._ATTEMPT_ENV] == "2"


def test_reexec_or_die_carries_callers_metric(monkeypatch, capsys):
    """Importers pass their own metric name; the soft-fail line must carry
    it (not bench's headline metric) so recorded artifacts stay labeled
    correctly (ADVICE r4)."""
    monkeypatch.setenv(bench._ATTEMPT_ENV, "2")
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench._reexec_or_die("boom", attempts=2, retry_delay=0.0,
                         metric="int8_teacher_ab")
    assert exits == [0]
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "int8_teacher_ab"
    assert line["value"] is None and line["untrusted"] is True
    assert "unit" not in line  # the steps/sec unit belongs to the headline


def test_acquire_backend_failure_soft_exits_with_json(monkeypatch, capsys):
    import jax

    monkeypatch.setenv(bench._ATTEMPT_ENV, "1")
    monkeypatch.setenv("FITHUBERT_BENCH_ATTEMPTS", "1")

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", boom)
    exits = []

    def fake_exit(code):
        exits.append(code)
        raise SystemExit(code)

    monkeypatch.setattr(os, "_exit", fake_exit)
    with pytest.raises(SystemExit):
        bench._acquire_backend(init_timeout=60.0)
    assert exits == [0]
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] is None and line["untrusted"] is True
    assert "UNAVAILABLE" in line["error"]


def test_acquire_backend_success_returns_platform(monkeypatch):
    platform, kind = bench._acquire_backend(init_timeout=120.0)
    assert platform == "cpu"  # conftest forces the CPU mesh
    assert isinstance(kind, str) and kind
