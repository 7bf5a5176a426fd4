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


# ------------------------------------------------------- CTC sequence probe
# One level up from framewise tone classification (VERDICT r3 weak #5): the
# SUPERB ASR downstream is sequence TRANSDUCTION — a CTC head over frozen
# frames, greedy-decoded, scored by edit distance. This probe exercises the
# frame-rate/blank/alignment contract that workflow depends on.

CTC_ALPHABET = "abcd"


def make_spoken_dataset(
    n_utts: int, seed: int = 0, n_letters=(3, 6), letter_sec: float = 0.25
) -> Tuple[List[np.ndarray], List[str]]:
    """Synthetic 'speech': each utterance is a random letter string from a
    4-letter alphabet, each letter rendered as a PURE tone in a distinct
    frequency band for `letter_sec`, separated by silences long enough to
    survive the student's time reduction as blank frames. The waveform
    ENCODES the transcript (unlike the e2e corpus fixtures, whose sinusoids
    carry no text), so a CTC head over frequency-preserving frozen features
    can transcribe it — and cannot transcribe shuffled targets.

    Pure tones at non-harmonic spacing: an octave-spaced HARMONIC alphabet
    (like make_tone_dataset's) puts class c's 2*f0 partial exactly on class
    c+1's fundamental, which collapses the higher letters under a linear
    CTC head (measured: they decode as blank)."""
    rng = np.random.default_rng(seed)
    f0s = (160.0, 330.0, 700.0, 1500.0)  # no f0 multiple hits another band
    wavs, texts = [], []
    for _ in range(n_utts):
        k = int(rng.integers(n_letters[0], n_letters[1] + 1))
        text = "".join(rng.choice(list(CTC_ALPHABET), size=k))
        segs = []
        for ch in text:
            f0 = f0s[CTC_ALPHABET.index(ch)] * rng.uniform(0.97, 1.03)
            n = int(letter_sec * SR * rng.uniform(0.9, 1.1))
            t = np.arange(n) / SR
            seg = 0.6 * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
            # fade in/out to avoid clicks, then a silence gap (blank frames —
            # must span >= a few POST-time-reduction frames or repeated
            # letters become indistinguishable from one long one)
            ramp = min(len(seg) // 8, 320)
            seg[:ramp] *= np.linspace(0, 1, ramp)
            seg[-ramp:] *= np.linspace(1, 0, ramp)
            segs.append(seg)
            segs.append(np.zeros(int(0.15 * SR)))
        wav = np.concatenate(segs) + 0.02 * rng.standard_normal(
            sum(len(s) for s in segs))
        wavs.append(wav.astype(np.float32))
        texts.append(text)
    return wavs, texts


def extract_sequences(expert, wavs, layer: int = -1, batch_size: int = 8):
    """Frozen per-utterance frame-feature sequences [(T_i, D)] — the CTC
    probe needs sequences, not the flattened frames of the framewise probe."""
    seqs = []
    for i in range(0, len(wavs), batch_size):
        chunk = list(wavs[i: i + batch_size])
        out = expert(chunk)
        hs = out["hidden_states"][layer]
        pad = out["padding_mask"]
        t_max = max(len(w) for w in chunk)
        for j, w in enumerate(chunk):
            if pad is not None and pad.shape[1] == hs.shape[1]:
                valid = ~pad[j]
            else:
                n_frames = min(
                    hs.shape[1],
                    int(len(w) * hs.shape[1] / (t_max + 1e-9)) or 1,
                )
                valid = np.arange(hs.shape[1]) < n_frames
            seqs.append(np.asarray(hs[j][valid], np.float32))
    return seqs


def _greedy_ctc_decode(logits: np.ndarray, n_frames: int) -> str:
    """argmax -> collapse repeats -> drop blanks (blank id 0)."""
    ids = logits[:n_frames].argmax(-1)
    out, prev = [], 0
    for i in ids:
        if i != prev and i != 0:
            out.append(CTC_ALPHABET[i - 1])
        prev = i
    return "".join(out)


def _pack_ctc_batch(seqs, texts, mu, sd):
    t_max = max(s.shape[0] for s in seqs)
    l_max = max(len(t) for t in texts)
    b = len(seqs)
    x = np.zeros((b, t_max, seqs[0].shape[1]), np.float32)
    xpad = np.ones((b, t_max), np.float32)
    y = np.zeros((b, l_max), np.int32)
    ypad = np.ones((b, l_max), np.float32)
    for j, (s, txt) in enumerate(zip(seqs, texts)):
        x[j, : s.shape[0]] = (s - mu) / sd
        xpad[j, : s.shape[0]] = 0.0
        ids = [1 + CTC_ALPHABET.index(c) for c in txt]
        y[j, : len(ids)] = ids
        ypad[j, : len(ids)] = 0.0
    return x, xpad, y, ypad


def train_ctc_probe(
    seqs, texts: Sequence[str], steps: int = 6000, lr: float = 0.05,
    seed: int = 0, eval_seqs=None, eval_texts=None, hidden: int = 64,
) -> Tuple[float, float]:
    """A small CTC head (one hidden layer, D -> hidden -> blank+alphabet) on
    FROZEN feature sequences. Returns (final train ctc loss, greedy-decode
    CER) — scored on the HELD-OUT (eval_seqs, eval_texts) when given, else
    on the training utterances.

    Why not a linear head: with a randomly-initialized upstream, attention
    mixes the whole utterance into every frame, so even a 320-param linear
    head fully memorizes arbitrary (shuffled) training transcripts while
    the CTC objective sticks in a blank-heavy local optimum for the TRUE
    ones (measured: linear probe train loss plateaued lr-independently at
    21.2 while the shuffled control fit to 0.04). One hidden layer gives
    the optimizer an escape route; held-out scoring separates the tone
    solution (generalizes) from fingerprint memorization (does not)."""
    import jax
    import jax.numpy as jnp
    import optax

    from fithubert_tpu.utils.text import cer

    n_cls = 1 + len(CTC_ALPHABET)
    flat = np.concatenate(seqs, axis=0)
    mu, sd = flat.mean(0, keepdims=True), flat.std(0, keepdims=True) + 1e-6
    x, xpad, y, ypad = map(jnp.asarray, _pack_ctc_batch(seqs, texts, mu, sd))

    d = x.shape[-1]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "w1": jax.random.normal(k1, (d, hidden)) / np.sqrt(d),
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, n_cls)) * 0.01,
        "b2": jnp.zeros((n_cls,)),
    }

    def head(p, xx):
        return jax.nn.relu(xx @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps),
                     weight_decay=1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return optax.ctc_loss(head(p, x), xpad, y, ypad,
                                  blank_id=0).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)

    if eval_seqs is not None:  # train-set normalization, unseen utterances
        sx, spad, _, _ = _pack_ctc_batch(eval_seqs, eval_texts, mu, sd)
        stexts = list(eval_texts)
    else:
        sx, spad, stexts = np.asarray(x), np.asarray(xpad), list(texts)
    logits = np.asarray(head(params, jnp.asarray(sx)))
    hyps = [
        _greedy_ctc_decode(logits[j], int((1 - spad[j]).sum()))
        for j in range(len(stexts))
    ]
    return float(loss), cer(stexts, hyps)


def run_ctc_probe(expert, n_utts: int = 60, steps: int = 6000,
                  layer: int = -1, seed: int = 0, n_eval: int = 12):
    """CTC probe vs transcript-shuffled control, scored on HELD-OUT
    utterances. A decisively lower probe CER requires the export to preserve
    frame-level ORDER and rate (the SUPERB-ASR alignment contract), not just
    framewise class separability. Held-out scoring is essential: the
    student's positional features give even a LINEAR head enough capacity
    to fully memorize shuffled training transcripts (measured: control
    train-CER 0.0 at 6000 steps) — only generalization separates signal
    from memorization. With the random-init upstream used in tests the
    probe's held-out CER is imperfect (~0.5; a distilled upstream's
    features would do far better) while the control degenerates completely
    (CER > 1 with repetition soup), so the assertion is the GAP."""
    wavs, texts = make_spoken_dataset(n_utts, seed=seed)
    seqs = extract_sequences(expert, wavs, layer)
    # tiny smoke runs: keep at least half the utterances for training
    n_eval = min(n_eval, max(1, n_utts // 2))
    tr_s, tr_t = seqs[:-n_eval], texts[:-n_eval]
    ev_s, ev_t = seqs[-n_eval:], texts[-n_eval:]
    loss, probe_cer = train_ctc_probe(
        tr_s, tr_t, steps, seed=seed, eval_seqs=ev_s, eval_texts=ev_t)
    rng = np.random.default_rng(seed + 1)
    shuffled = [tr_t[i] for i in rng.permutation(len(tr_t))]
    c_loss, control_cer = train_ctc_probe(
        tr_s, shuffled, steps, seed=seed, eval_seqs=ev_s, eval_texts=ev_t)
    return {
        "probe_ctc_loss": loss,
        "probe_cer": probe_cer,
        "control_ctc_loss": c_loss,
        "control_cer": control_cer,
        "n_utts": n_utts,
        "n_eval": n_eval,
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
    ap.add_argument("--ctc", action="store_true",
                    help="run the CTC sequence-transduction probe instead")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fithubert_tpu.export.expert import UpstreamExpert

    expert = UpstreamExpert(args.ckpt, args.config, length_quantum=8000)
    import json

    if args.ctc:
        res = run_ctc_probe(expert, args.n_utts, args.steps, args.layer)
        print(json.dumps(res))
        ok = res["probe_cer"] < res["control_cer"] - 0.2
        print("CTC PROBE " + ("PASSED" if ok else "FAILED")
              + f": cer {res['probe_cer']:.3f} vs control "
              f"{res['control_cer']:.3f}")
        return 0 if ok else 1
    res = run_probe(expert, args.n_utts, args.classes, args.steps, args.layer)
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
