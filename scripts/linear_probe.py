#!/usr/bin/env python
"""Frozen-feature downstream probe: the SUPERB-workflow proxy (L0 consumer).

The reference's whole point is downstream evaluation of the distilled student
through s3prl (`run_downstream.py -u fithubert`, reference README.md:18-29,
fithubert/expert.py:52-75): freeze the upstream, feed its features to a small
trainable head. External s3prl is not available here, so this script realizes
the same workflow standalone — it is the first CONSUMER of the export API
rather than another producer-side contract test:

    1. load the exported student through UpstreamExpert (ckpt + yaml pair,
       or a reference lightning .ckpt),
    2. extract frozen features for a set of labeled waveforms,
    3. train a framewise linear softmax probe on them (the upstream stays
       frozen, exactly like a SUPERB downstream head),
    4. report probe cross-entropy/accuracy against a LABEL-SHUFFLED control —
       a probe that only beats the control because the features carry
       task-relevant structure the export preserved end to end.

CLI (synthetic tone-class task, no corpus needed):

    python scripts/linear_probe.py --ckpt run/student.msgpack \
        --config run/student.yaml [--n-utts 24] [--classes 4] [--steps 300]

Exits non-zero if the probe fails to beat the shuffled control.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Sequence, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16_000


def make_tone_dataset(
    n_utts: int, n_classes: int, seed: int = 0, dur_range=(0.8, 1.6)
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Labeled waveforms: class c = harmonic tone in a distinct f0 band
    (+noise, random phase/duration). A linear probe over informative frame
    features separates these; over label-shuffled features it cannot."""
    rng = np.random.default_rng(seed)
    wavs, labels = [], []
    for i in range(n_utts):
        c = i % n_classes
        # octave-spaced bands: within-class jitter stays far from the
        # neighboring class at every class count
        f0 = 125.0 * (2.0 ** c) + rng.uniform(-15.0, 15.0)
        n = int(rng.uniform(*dur_range) * SR)
        t = np.arange(n) / SR
        phase = rng.uniform(0, 2 * np.pi)
        sig = (
            0.5 * np.sin(2 * np.pi * f0 * t + phase)
            + 0.25 * np.sin(2 * np.pi * 2 * f0 * t + phase)
            + 0.05 * rng.standard_normal(n)
        )
        wavs.append(sig.astype(np.float32))
        labels.append(c)
    return wavs, np.asarray(labels, np.int32)


def extract_frame_features(
    expert, wavs: Sequence[np.ndarray], labels: np.ndarray, layer: int = -1,
    batch_size: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frozen features for every VALID frame + per-frame labels.

    Uses `hidden_states[layer]` (the s3prl contract surface downstream heads
    actually consume; -1 = last encoder hidden)."""
    feats, frame_labels = [], []
    for i in range(0, len(wavs), batch_size):
        chunk = list(wavs[i : i + batch_size])
        out = expert(chunk)
        hs = out["hidden_states"][layer]
        pad = out["padding_mask"]
        # hs.shape[1] is set by the LONGEST wav in the chunk — frame counts
        # must be derived against it, not chunk[0] (which may be shorter and
        # would over-count valid frames for every other row)
        t_max = max(len(w) for w in chunk)
        for j, w in enumerate(chunk):
            if pad is not None and pad.shape[1] == hs.shape[1]:
                valid = ~pad[j]
            else:  # mask is at a different rate (e.g. post-TR): length-derive
                n_frames = min(
                    hs.shape[1],
                    int(len(w) * hs.shape[1] / (t_max + 1e-9)) or 1,
                )
                valid = np.arange(hs.shape[1]) < n_frames
            f = np.asarray(hs[j][valid], np.float32)
            feats.append(f)
            frame_labels.append(np.full(len(f), labels[i + j], np.int32))
    x = np.concatenate(feats, axis=0)
    y = np.concatenate(frame_labels, axis=0)
    return x, y


def train_linear_probe(
    feats: np.ndarray, labels: np.ndarray, n_classes: int,
    steps: int = 300, lr: float = 0.05, seed: int = 0,
) -> Tuple[float, float]:
    """Full-batch softmax regression on FROZEN features (the upstream never
    updates — only this (D, C) head trains). Returns (final CE loss, acc)."""
    import jax
    import jax.numpy as jnp
    import optax

    mu = feats.mean(axis=0, keepdims=True)
    sd = feats.std(axis=0, keepdims=True) + 1e-6
    x = jnp.asarray((feats - mu) / sd)
    y = jnp.asarray(labels)
    d = x.shape[1]
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(seed), (d, n_classes)) * 0.01,
        "b": jnp.zeros((n_classes,)),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    logits = np.asarray(x @ params["w"] + params["b"])
    acc = float((logits.argmax(-1) == np.asarray(y)).mean())
    return float(loss), acc


def run_probe(
    expert, n_utts: int = 24, n_classes: int = 4, steps: int = 300,
    layer: int = -1, seed: int = 0,
):
    """Probe vs label-shuffled control. Returns a result dict."""
    wavs, labels = make_tone_dataset(n_utts, n_classes, seed=seed)
    feats, frame_labels = extract_frame_features(expert, wavs, labels, layer)
    loss, acc = train_linear_probe(feats, frame_labels, n_classes, steps)
    # control: identical features, labels shuffled -> no learnable mapping
    rng = np.random.default_rng(seed + 1)
    shuffled = frame_labels[rng.permutation(len(frame_labels))]
    c_loss, c_acc = train_linear_probe(feats, shuffled, n_classes, steps)
    return {
        "probe_loss": loss,
        "probe_acc": acc,
        "control_loss": c_loss,
        "control_acc": c_acc,
        "n_frames": int(len(frame_labels)),
        "feature_dim": int(feats.shape[1]),
        "chance": 1.0 / n_classes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="student export (.msgpack) or reference .ckpt")
    ap.add_argument("--config", required=True, help="dumped student yaml")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--n-utts", type=int, default=24)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--layer", type=int, default=-1)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fithubert_tpu.export.expert import UpstreamExpert

    expert = UpstreamExpert(args.ckpt, args.config, length_quantum=8000)
    res = run_probe(expert, args.n_utts, args.classes, args.steps, args.layer)
    import json

    print(json.dumps(res))
    ok = (
        res["probe_acc"] > res["control_acc"] + 0.2
        and res["probe_loss"] < res["control_loss"]
    )
    print("PROBE " + ("PASSED" if ok else "FAILED")
          + f": acc {res['probe_acc']:.3f} vs control {res['control_acc']:.3f}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
