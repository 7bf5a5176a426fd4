#!/usr/bin/env python
"""On-chip dress rehearsal of the FULL L6->L0 chain (VERDICT r4 #4).

Before round 5 the on-chip evidence was bench + kernel tests + a smoke
trace; the orchestration layers (train loop, eval, preemption checkpointing,
resume, export, downstream probe) had only ever run TOGETHER on CPU. This
script runs, on whatever backend `python` sees (the real v5e under axon;
pass --cpu for a host-mesh smoke):

  1. `train.py -c configs/rehearsal.yaml` (release geometry, synthetic
     corpus) in a subprocess; after `--sigterm-after` optimizer steps are
     observed on stdout, deliver SIGTERM (the cloud-TPU preemption signal,
     train/loop.py:85-102) and require a preemption checkpoint + clean exit.
  2. Relaunch the same command; require the run to RESUME from the
     preemption step (restored step printed by the loop) and to continue
     with a CONTINUOUS loss curve: the first post-resume loss must sit
     within `--continuity-tol` (relative) of the last pre-SIGTERM loss —
     random re-init would put it back at the cold-start loss, several x
     higher. Runs to train.max_steps, exporting the (yaml, msgpack) pair.
  3. `scripts/linear_probe.py --ctc` consumes the exported student
     (the s3prl-expert contract) and must report a collapsing CTC loss.

Writes a JSON summary + the raw logs under artifacts/ and exits nonzero on
any broken link in the chain.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# '(?:.* )?loss=': loss must start a key (preceded by a space or the step
# field) — a lazy '.*?loss=' would capture attn_loss/cnn_loss/ctc_loss,
# which sort BEFORE 'loss' in the echo's key order, whenever those terms
# are enabled. 'nan|inf' included so a diverged step FAILS the continuity
# check loudly instead of being silently dropped from it.
STEP_RE = re.compile(r"\[train\] step=(\d+) (?:.* )?loss=([0-9.]+|nan|inf)")
RESUME_RE = re.compile(r"\[resume\] restored step (\d+)")


def _launch(cmd, log_path):
    log = open(log_path, "a", buffering=1)
    proc = subprocess.Popen(
        cmd, cwd=HERE, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1,
    )
    return proc, log


def _pump(proc, log, on_line, timeout_s):
    """Stream subprocess stdout to the log, invoking on_line per line.

    The timeout is enforced by a watchdog thread that kills the subprocess:
    a readline-side check alone never fires when the child hangs SILENTLY
    (remote compiles print nothing for minutes, and the tunnel can wedge) —
    killing the child unblocks the readline with EOF."""
    import threading

    timed_out = threading.Event()

    def watchdog():
        if not timed_out.wait(timeout=timeout_s):
            proc.kill()

    th = threading.Thread(target=watchdog, daemon=True)
    th.start()
    try:
        for line in proc.stdout:
            log.write(line)
            on_line(line.rstrip("\n"))
        rc = proc.wait()
    finally:
        timed_out.set()
        log.close()
    if rc != 0 and proc.returncode in (-9,):  # killed by the watchdog
        raise TimeoutError(f"phase exceeded {timeout_s}s")
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/rehearsal.yaml")
    ap.add_argument("--cpu", action="store_true",
                    help="host-mesh smoke (uses configs/smoke.yaml unless "
                         "--config is explicit)")
    ap.add_argument("--sigterm-after", type=int, default=100,
                    help="optimizer steps before the preemption SIGTERM")
    ap.add_argument("--continuity-tol", type=float, default=0.35,
                    help="max |post-resume loss / pre-SIGTERM loss - 1| "
                         "(dropout/data differ across the boundary; a "
                         "re-init would be several x off)")
    ap.add_argument("--phase-timeout", type=float, default=2400.0)
    args = ap.parse_args()

    cfg = args.config
    if args.cpu and cfg == ap.get_default("config"):
        # the documented smoke fallback: a release-geometry 240-step run
        # would blow the phase timeout mid-compile on the 1-core CPU
        cfg = "configs/smoke.yaml"
        if args.sigterm_after == ap.get_default("sigterm_after"):
            args.sigterm_after = 8  # smoke trains 16 steps total
    train_cmd = [sys.executable, "train.py", "-c", cfg]
    if args.cpu:
        train_cmd += ["--platform", "cpu"]

    os.makedirs(os.path.join(HERE, "artifacts"), exist_ok=True)
    tag = "cpu" if args.cpu else "tpu"
    log_path = os.path.join(HERE, "artifacts", f"dress_rehearsal_{tag}.log")
    open(log_path, "w").close()
    summary = {"metric": "dress_rehearsal", "config": cfg, "backend": tag}

    # fresh run directory
    import yaml

    with open(os.path.join(HERE, cfg)) as f:
        out_dir = yaml.safe_load(f)["train"]["output_dir"]
    subprocess.run(["rm", "-rf", os.path.join(HERE, out_dir)], check=True)

    # ---- phase 1: train until SIGTERM ------------------------------------
    state = {"steps": [], "sent": False, "resumed_from": None}

    proc, log = _launch(train_cmd + ["--no-resume"], log_path)

    def phase1(line):
        m = STEP_RE.search(line)
        if m and "val/" not in line:
            state["steps"].append((int(m.group(1)), float(m.group(2))))
            if (not state["sent"]
                    and int(m.group(1)) >= args.sigterm_after):
                print(f"[rehearsal] SIGTERM at step {m.group(1)}", flush=True)
                proc.send_signal(signal.SIGTERM)
                state["sent"] = True

    rc = _pump(proc, log, phase1, args.phase_timeout)
    assert state["sent"], "run finished before the SIGTERM step was reached"
    assert rc == 0, f"preempted run exited rc={rc}"
    pre_step, pre_loss = state["steps"][-1]
    summary["preempt_step"] = pre_step
    summary["preempt_loss"] = pre_loss
    with open(log_path) as f:
        assert "[preemption] checkpointed step" in f.read(), \
            "no preemption checkpoint recorded"

    # ---- phase 2: resume to completion ------------------------------------
    state["steps"] = []
    proc, log = _launch(train_cmd, log_path)

    def phase2(line):
        m = RESUME_RE.search(line)
        if m:
            state["resumed_from"] = int(m.group(1))
        m = STEP_RE.search(line)
        if m and "val/" not in line:
            state["steps"].append((int(m.group(1)), float(m.group(2))))

    rc = _pump(proc, log, phase2, args.phase_timeout)
    assert rc == 0, f"resumed run exited rc={rc}"
    assert state["resumed_from"] is not None, "no [resume] line printed"
    assert state["resumed_from"] >= pre_step, (state["resumed_from"], pre_step)
    assert state["steps"], "no post-resume training steps"
    first_step, first_loss = state["steps"][0]
    assert first_step > pre_step, (first_step, pre_step)
    drift = abs(first_loss / pre_loss - 1.0)
    summary["resumed_from"] = state["resumed_from"]
    summary["post_resume_step"] = first_step
    summary["post_resume_loss"] = first_loss
    summary["loss_continuity_rel"] = round(drift, 4)
    assert drift <= args.continuity_tol, (
        f"loss discontinuity across resume: {pre_loss} -> {first_loss} "
        f"({drift:.2%} > {args.continuity_tol:.0%})")
    summary["final_step"] = state["steps"][-1][0]
    summary["final_loss"] = state["steps"][-1][1]

    # ---- phase 3: CTC probe on the export ---------------------------------
    yaml_path = os.path.join(HERE, out_dir, "student.yaml")
    ckpt_path = os.path.join(HERE, out_dir, "student.msgpack")
    assert os.path.exists(yaml_path) and os.path.exists(ckpt_path), \
        f"export pair missing under {out_dir}"
    probe_cmd = [sys.executable, "scripts/linear_probe.py",
                 "--ckpt", ckpt_path, "--config", yaml_path, "--ctc"]
    if args.cpu:
        probe_cmd += ["--platform", "cpu", "--n-utts", "16", "--steps", "60"]
    probe = subprocess.run(
        probe_cmd, cwd=HERE, capture_output=True, text=True,
        timeout=args.phase_timeout,
    )
    with open(log_path, "a") as f:
        f.write(probe.stdout + probe.stderr)
    assert probe.returncode == 0, f"probe failed: {probe.stderr[-2000:]}"
    summary["probe_tail"] = probe.stdout.strip().splitlines()[-1]

    summary["ok"] = True
    out = os.path.join(HERE, "artifacts", f"dress_rehearsal_{tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
