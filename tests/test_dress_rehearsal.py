"""The dress-rehearsal harness's log-format coupling (scripts/dress_rehearsal.py).

The harness drives train.py as a subprocess and steers on two stdout
patterns (step/loss lines, the resume line). These tests pin that contract
so a logging reformat in train/loop.py fails HERE instead of silently
breaking the on-chip rehearsal (whose full runs live in artifacts/).
"""

import scripts.dress_rehearsal as dr


def test_step_regex_matches_loop_format():
    line = ("[train] step=105 grad_norm=0.1912 l11=0.3062 loss=0.7589 "
            "lr=0.0004 rand_l0=0.0358 total=0.7589 steps_per_sec=0.2967")
    m = dr.STEP_RE.search(line)
    assert m and m.group(1) == "105" and m.group(2) == "0.7589"


def test_step_regex_skips_other_loss_keys_and_catches_nan():
    """attn/cnn/ctc_loss sort BEFORE 'loss' in the echo's key order — the
    regex must capture the total, and a nan loss must MATCH (so the
    continuity assert fails loudly) rather than drop the line."""
    line = ("[train] step=10 attn_loss=0.3100 cnn_loss=0.2000 "
            "grad_norm=1.0 loss=0.7500 total=0.7500")
    m = dr.STEP_RE.search(line)
    assert m and m.group(2) == "0.7500"
    m = dr.STEP_RE.search("[train] step=11 ctc_loss=0.1 loss=nan total=nan")
    assert m and m.group(2) == "nan"
    import math

    assert math.isnan(float(m.group(2)))


def test_pump_kills_a_silently_hung_child():
    """A child that prints nothing and never exits must be killed by the
    watchdog after the phase timeout (the readline-side check alone never
    fires on silence — the r5 review finding)."""
    import io
    import subprocess
    import sys
    import time

    import pytest

    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1,
    )
    t0 = time.time()
    with pytest.raises(TimeoutError):
        dr._pump(proc, io.StringIO(), lambda s: None, timeout_s=2.0)
    assert time.time() - t0 < 30
    assert proc.returncode is not None


def test_step_regex_ignores_val_lines_by_caller_filter():
    # the harness filters "val/" lines itself; the regex must still parse
    # plain train lines that contain no loss= field as non-matches
    assert dr.STEP_RE.search("[train] step=16 val/total=0.86") is None


def test_resume_regex():
    m = dr.RESUME_RE.search("[resume] restored step 100 (epoch 1)")
    assert m and m.group(1) == "100"


def test_loop_emits_the_pinned_formats():
    """The actual emitting code must keep matching: the resume line lives in
    train/loop.py, the [train] k=v echo in utils/logging.py — a reformat of
    either trips this test instead of silently breaking the harness."""
    import inspect

    from fithubert_tpu.train import loop
    from fithubert_tpu.utils import logging as flog

    assert "[resume] restored step" in inspect.getsource(loop)
    assert '"[train]"' in inspect.getsource(flog)
    # end-to-end: a real logger echo line parses with the harness regex
    import io
    import sys

    cap = io.StringIO()
    real = sys.stderr
    try:
        sys.stderr = cap
        lg = flog.MetricsLogger.__new__(flog.MetricsLogger)
        lg._f = io.StringIO()
        lg._t0 = 0.0
        lg.log(7, {"loss": 0.5}, echo=True)
    finally:
        sys.stderr = real
    m = dr.STEP_RE.search(cap.getvalue())
    assert m and m.group(1) == "7" and m.group(2) == "0.5000"
