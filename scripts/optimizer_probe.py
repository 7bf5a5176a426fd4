#!/usr/bin/env python
"""Attribute the optimizer's in-step cost (VERDICT r4 #2, second half).

The step-cost split prices the AdamW update at ~6 ms/step against a ~1.9 ms
HBM floor (read g/p/m/v + write p/m/v at fp32 over ~22.5M params). This
probe measures, on-chip, with the two-point-difference method (CLAUDE.md:
fori_loop chains of K1/K2 updates; the fetch barrier's ~60 ms and the
launch overhead cancel in the difference):

  a. tree      — optax.adamw over the release student param tree
                 (~300 leaves), exactly as the train step runs it;
  b. tree+gn   — a. plus optax.global_norm(grads) (the logging term);
  c. flat      — the same total bytes as ONE fused leaf: adamw over a
                 single concatenated vector. The delta (a - c) isolates
                 per-leaf fusion overhead from bandwidth.

(optax.flatten IN-STEP was already measured negative — the per-step ravel
copies of the 90 MB grad tree cost more than the fusion saves, train/optim.py
— so a large (a - c) gap EXPLAINS the 6 ms rather than prescribing a fix.)

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp
    import optax

    platform, kind = bench._acquire_backend(metric="optimizer_probe")
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.train.optim import build_optimizer
    from fithubert_tpu.train.step import Distiller

    cfg = load_yaml_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "fithubert.yaml"))
    d = Distiller(cfg, num_training_steps=1000)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 16 * 320), jnp.float32)
    state = d.init_state(rng, small)
    params = state.params
    tx, _ = build_optimizer(cfg.optimizer, 1000)
    grads = jax.tree.map(lambda p: jnp.full(p.shape, 1e-4, jnp.float32), params)

    n_params = sum(int(l.size) for l in jax.tree.leaves(params))
    n_leaves = len(jax.tree.leaves(params))
    sync, fetch_ok = bench._make_sync()
    out = {"metric": "optimizer_probe", "device_kind": kind,
           "n_params": n_params, "n_leaves": n_leaves}

    def measure(update_fn, init_carry, tag, k1=8, k2=32, reps=3):
        # one compile per loop bound (each distinct fori_loop bound is a
        # fresh ~80 s remote compile — keep it to two), reps share them
        runs = {}
        for k in (k1, k2):
            @jax.jit
            def run(carry, _k=k):
                return jax.lax.fori_loop(0, _k, update_fn, carry)

            c = run(init_carry)
            sync(jax.tree.leaves(c)[0].ravel()[0])  # compile + warm
            runs[k] = run
        per_step = []
        for _ in range(reps):
            ts = {}
            for k in (k1, k2):
                t0 = time.perf_counter()
                c = runs[k](init_carry)
                sync(jax.tree.leaves(c)[0].ravel()[0])
                ts[k] = time.perf_counter() - t0
            per_step.append((ts[k2] - ts[k1]) / (k2 - k1))
        out[f"ms_per_update_{tag}"] = round(min(per_step) * 1000, 3)

    # grads must VARY per iteration or XLA constant-folds the g-dependent
    # terms out of the loop (a first cut with loop-invariant grads measured
    # 0.397 ms — below the HBM floor). Deriving them from p costs no extra
    # HBM traffic (p is read anyway) and changes every iteration.
    def grads_of(p_tree, i):
        scale = 1e-6 + 1e-9 * i.astype(jnp.float32)
        return jax.tree.map(lambda p: p * scale + 1e-4, p_tree)

    # a. the real tree update ------------------------------------------------
    opt_state = tx.init(params)

    def tree_body(i, carry):
        p, s = carry
        u, s = tx.update(grads_of(p, i), s, p)
        return (optax.apply_updates(p, u), s)

    measure(tree_body, (params, opt_state), "tree")

    # b. + global_norm (the step's logging term) -----------------------------
    def tree_gn_body(i, carry):
        p, s, acc = carry
        g = grads_of(p, i)
        u, s = tx.update(g, s, p)
        return (optax.apply_updates(p, u), s, acc + optax.global_norm(g))

    measure(tree_gn_body, (params, opt_state, jnp.zeros(())), "tree_gnorm")

    # c. single-leaf control: same bytes, one fusion -------------------------
    flat = jnp.zeros((n_params,), jnp.float32) + 1e-3
    s_flat = tx.init(flat)

    def flat_body(i, carry):
        p, s = carry
        g = p * (1e-6 + 1e-9 * i.astype(jnp.float32)) + 1e-4
        u, s = tx.update(g, s, p)
        return (optax.apply_updates(p, u), s)

    measure(flat_body, (flat, s_flat), "flat")

    # read p/m/v + write p/m/v (g is derived in-register from p here)
    floor_ms = (n_params * 4 * 6) / 819e9 * 1000
    out["hbm_floor_ms"] = round(floor_ms, 3)
    out["per_leaf_overhead_ms"] = round(
        out["ms_per_update_tree"] - out["ms_per_update_flat"], 3)
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
