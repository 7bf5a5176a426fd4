"""Same-session in-step A/B of the pos-conv input-grad orientation barrier
(scripts/posconv_dx_probe.py found XLA:TPU re-folding the custom VJP's kernel
flip into the slow rhs_reversal conv; ops/conv.py:_gc_bwd now blocks the fold
with an optimization_barrier, gated by FITHUBERT_POSCONV_DX=barrier/folded).
Two jitted KD train steps at the fithubert.yaml geometry, identical except
the gate at trace time; interleaved timing rounds cancel tunnel drift; loss
trajectories under both modes are compared for equality (the probe showed
the two orientations produce bit-identical dx)."""
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench

def main():
    import jax, jax.numpy as jnp
    platform, kind = bench._acquire_backend(metric="posconv_dx_ab")
    from fithubert_tpu.config import load_yaml_config
    from fithubert_tpu.models import TeacherGeometry
    from fithubert_tpu.train.step import Distiller
    from fithubert_tpu.utils.rng import root_step_key

    cfg = load_yaml_config("/root/repo/configs/fithubert.yaml")
    b, accum, t_wav = 3, 4, 12 * 16000
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 16 * 320), jnp.float32)
    sync, fetch_ok = bench._make_sync()

    MODES = ("barrier", "folded")
    steps = {}
    states = {}
    tg = dataclasses.replace(TeacherGeometry.from_teacher_config(cfg.teacher),
                             compute_dtype="bfloat16")
    d = Distiller(cfg, num_training_steps=1000, teacher_geometry=tg)
    tp_host = jax.device_get(d.init_teacher_params(rng, small))
    st_host = jax.device_get(d.init_state(jax.random.fold_in(rng, 1), small))
    tp = d.shard_teacher(tp_host)
    np_rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(np_rng.standard_normal((accum, b, t_wav)) * 0.1,
                              jnp.float32),
             "padding_mask": jnp.zeros((accum, b, t_wav), dtype=bool)}
    rand = jnp.arange(11, dtype=jnp.int32)
    key = root_step_key(0)

    traj = {}
    for mode in MODES:
        os.environ["FITHUBERT_POSCONV_DX"] = mode
        step = d.make_train_step()   # fresh trace under this mode
        st = d.shard_state(jax.tree.map(jnp.array, st_host))
        st, logs = step(st, tp, batch, rand, key); sync(logs["loss"])
        # 3-step loss trajectory for the numerics check (exercises the
        # BACKWARD both modes differ in; eval would not)
        losses = [float(np.asarray(jax.device_get(logs["loss"])))]
        for _ in range(2):
            st, logs = step(st, tp, batch, rand, key)
            losses.append(float(np.asarray(jax.device_get(logs["loss"]))))
        traj[mode] = losses
        steps[mode] = step
        states[mode] = st

    out = {"metric": "posconv_dx_ab", "device_kind": kind}
    times = {m: 0.0 for m in MODES}
    rounds, iters = 4, 8
    for r in range(rounds):
        for mode in MODES:
            step, st = steps[mode], states[mode]
            st, logs = step(st, tp, batch, rand, key); sync(logs["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                st, logs = step(st, tp, batch, rand, key)
            sync(logs["loss"])
            times[mode] += time.perf_counter() - t0
            states[mode] = st
    n = rounds * iters
    for m in MODES:
        out[f"steps_per_sec_{m}"] = round(n / times[m], 3)
    out["barrier_speedup"] = round(times["folded"] / times["barrier"], 4)
    out["loss_traj_barrier"] = traj["barrier"]
    out["loss_traj_folded"] = traj["folded"]
    out["traj_equal"] = traj["barrier"] == traj["folded"]
    out["fetch_ok"] = bool(fetch_ok and not sync.degraded)
    print(json.dumps(out), flush=True)

main()
